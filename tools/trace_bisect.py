"""Bisect the superlinear trace+lower time of the full stitch program."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from imagestitch_tpu.config import PipelineConfig
from imagestitch_tpu import pipeline as pline

H, W = 1080, 1920
cfg = PipelineConfig()
key = jax.random.key(0)


def f32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    jaxpr = jax.make_jaxpr(fn)(*args)
    t1 = time.perf_counter()
    n = len(jaxpr.eqns)
    t2 = time.perf_counter()
    jax.jit(fn).lower(*args)
    t3 = time.perf_counter()
    print(f"{name:22s} trace {t1 - t0:7.2f}s  lower {t3 - t2:7.2f}s  "
          f"eqns {n}", flush=True)


which = set(sys.argv[1:]) or {"front", "full", "noblend"}

if "front" in which:
    timeit("front",
           lambda a, b, k: pline.stitch_pair_front_impl(a, b, k, cfg),
           f32(H, W, 3), f32(H, W, 3), key)
if "noblend" in which:
    c2 = cfg.replace(seam=cfg.seam.__class__(kind="none"),
                     blend=cfg.blend.__class__(kind="none"))
    timeit("full_seam_none",
           lambda a, b, k: pline.stitch_pair_impl(a, b, k, c2),
           f32(H, W, 3), f32(H, W, 3), key)
if "full" in which:
    timeit("full",
           lambda a, b, k: pline.stitch_pair_impl(a, b, k, cfg),
           f32(H, W, 3), f32(H, W, 3), key)
