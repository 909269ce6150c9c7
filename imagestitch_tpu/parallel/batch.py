"""Batched multi-pair stitching over a device mesh.

The throughput-stretch configuration of BASELINE.json ("32 image pairs per
dispatch, batched 4K / video"): a vmapped stitch_pair program whose batch
dimension shards over the mesh's "data" axis. The per-pair programs are
independent, so XLA partitions the whole pipeline with zero cross-chip
traffic until the host gathers results; combined with the "model"-axis
hints inside RANSAC (parallel.mesh.shard_hint) a 2-D mesh splits both
across pairs and within each pair's hypothesis scoring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from imagestitch_tpu.config import PipelineConfig
from imagestitch_tpu.parallel.mesh import data_sharding
from imagestitch_tpu.pipeline import stitch_pair_impl


@functools.partial(jax.jit, static_argnames=("cfg",))
def stitch_pairs_batched(pairs: jnp.ndarray, keys: jax.Array,
                         cfg: PipelineConfig = PipelineConfig()):
    """pairs: (B, 2, H, W, 3) RGB; keys: (B,) PRNG keys.

    Returns (panos (B, Hc, Wc, 3), valids (B, Hc, Wc), corners (B, 2),
    metrics pytree batched over B). Uncropped canvases — cropping is a host
    concern (dynamic shapes).

    seam.orient="auto" is resolved to "vertical" here: under vmap the
    per-pair lax.cond orientation dispatch becomes compute-both-select —
    BOTH seam scans would run for EVERY pair (measured ~8 ms/pair extra at
    1080p). Horizontal panorama batches want the vertical seam anyway;
    pass orient="horizontal" explicitly for stacked pairs.
    """
    if cfg.seam.orient == "auto":
        import dataclasses
        cfg = cfg.replace(
            seam=dataclasses.replace(cfg.seam, orient="vertical"))

    def one(pair, key):
        return stitch_pair_impl(pair[0], pair[1], key, cfg)

    return jax.vmap(one)(pairs, keys)


def stitch_pairs_sharded(pairs, keys, mesh, cfg: PipelineConfig
                         = PipelineConfig()):
    """Run the batched stitch with the batch dim sharded over mesh axis
    "data" (and RANSAC hypotheses over "model" if the mesh has one)."""
    pairs = jax.device_put(jnp.asarray(pairs),
                           data_sharding(mesh, 5, "data"))
    keys = jax.device_put(keys, data_sharding(mesh, keys.ndim, "data"))
    prev = jax.sharding.get_mesh()
    jax.sharding.set_mesh(mesh)
    try:
        return stitch_pairs_batched(pairs, keys, cfg)
    finally:
        jax.sharding.set_mesh(prev)
