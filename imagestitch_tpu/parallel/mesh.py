"""Device-mesh helpers and sharding hints.

The reference has NO distributed backend (SURVEY.md §2 "Parallelism
inventory": its only concurrency is cv::parallel_for_ over image pairs,
特征点匹配.cpp:139-142). The TPU-native scaling model is SPMD over a
jax.sharding.Mesh:

- axis "data": batches of image pairs (the throughput-stretch config of
  BASELINE.json — 32 pairs per dispatch) shard across chips; no cross-chip
  traffic except at the output gather.
- axis "model": within one stitch, the RANSAC hypothesis batch and the
  descriptor-distance matrix rows shard across chips; XLA inserts the
  argmax/top-k collectives over ICI.

`shard_hint` annotates an intermediate with a PartitionSpec when the
enclosing computation runs under a mesh that has the named axis, and is a
no-op otherwise — stage kernels stay mesh-agnostic.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Build a Mesh from {"axis": size} over the available devices."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev, names)


def _current_axes():
    mesh = jax.sharding.get_abstract_mesh()
    return tuple(mesh.axis_names) if mesh is not None else ()


def shard_hint(x, axis_name: str, dim: int = 0):
    """Constrain dim `dim` of `x` to shard over mesh axis `axis_name` if the
    surrounding mesh context defines it; identity otherwise."""
    try:
        axes = _current_axes()
    except Exception:
        return x
    if axis_name not in axes:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis_name
    return jax.lax.with_sharding_constraint(x, P(*spec))


def data_sharding(mesh: Mesh, ndim: int, axis_name: str = "data", dim: int = 0):
    """NamedSharding placing dim `dim` on `axis_name`, rest replicated."""
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))
