"""Per-stage XLA compile-time profiler (VERDICT r2 item 1).

Compiles each pipeline stage separately (AOT lower+compile, no execution)
at the bench shapes (2x1080p) and prints the wall-clock compile time per
stage, so the 909s first-call regression can be attributed.

Usage: python tools/compile_profile.py [stage ...]
  stages: detect match ba warp gain seam blend full front
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import PipelineConfig
from imagestitch_tpu import pipeline as pl


H, W = 1080, 1920
cfg = PipelineConfig()
CANVAS = pl._pano_canvas_shape((H, W), 2, cfg)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{name:28s} trace+lower {t1 - t0:7.2f}s   compile {t2 - t1:7.2f}s",
          flush=True)
    return compiled


def f32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def booll(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.bool_)


def main():
    want = set(sys.argv[1:]) or {
        "detect", "match", "ba", "warp", "gain", "seam", "blend", "full"}
    key = jax.random.key(0)
    print(f"backend={jax.default_backend()}  canvas={CANVAS}", flush=True)

    from imagestitch_tpu.features import detect as detect_features
    from imagestitch_tpu.matching.matcher import match_pair
    from imagestitch_tpu.types import ImageFeatures

    K = cfg.detector.max_keypoints
    feats = ImageFeatures(
        xy=f32(K, 2), response=f32(K),
        angle=f32(K), level=jax.ShapeDtypeStruct((K,), jnp.int32),
        size=f32(K),
        descriptors=jax.ShapeDtypeStruct((K, 256), jnp.uint8),
        valid=booll(K),
        img_size=jax.ShapeDtypeStruct((2,), jnp.int32))

    if "detect" in want:
        timeit("detect", lambda g: detect_features(g, cfg.detector), f32(H, W))
    if "match" in want:
        timeit("match_pair",
               lambda a, b, k: match_pair(a, b, k, 0, 1, cfg.matcher,
                                          cfg.ransac),
               feats, feats, key)
    if "ba" in want:
        from imagestitch_tpu.geometry.bundle import bundle_adjust_ray
        from imagestitch_tpu.types import CameraParams
        M = cfg.matcher.max_matches
        cams = CameraParams(focal=f32(2), aspect=f32(2), ppx=f32(2),
                            ppy=f32(2), R=f32(2, 3, 3), t=f32(2, 3))
        timeit("bundle_adjust_ray",
               lambda c, s, d, v, si, di, pv: bundle_adjust_ray(
                   c, s, d, v, si, di, pv, cfg.camera.ba_iters),
               cams, f32(1, M, 2), f32(1, M, 2), booll(1, M),
               jax.ShapeDtypeStruct((1,), jnp.int32),
               jax.ShapeDtypeStruct((1,), jnp.int32), booll(1))
    if "warp" in want:
        from imagestitch_tpu.types import CameraParams
        cams = CameraParams(focal=f32(2), aspect=f32(2), ppx=f32(2),
                            ppy=f32(2), R=f32(2, 3, 3), t=f32(2, 3))
        timeit("warp_all_shared",
               lambda imgs, c, s: pl._warp_all_shared(imgs, c, s, CANVAS,
                                                      cfg),
               f32(2, H, W, 3), cams, f32())
    if "gain" in want:
        timeit("gain", lambda w, m: pl._apply_exposure(w, m, cfg),
               f32(2, *CANVAS, 3), booll(2, *CANVAS))
    if "seam" in want:
        from imagestitch_tpu.seam.dp import dp_seam_pair
        max_w = -(-int(round(1.3 * W)) // 128) * 128
        timeit("dp_seam_pair",
               lambda a, b, ma, mb: dp_seam_pair(a, b, ma, mb, False,
                                                 max_overlap_w=max_w),
               f32(*CANVAS, 3), f32(*CANVAS, 3),
               booll(*CANVAS), booll(*CANVAS))
    if "blend" in want:
        timeit("seam_and_blend",
               lambda imgs, m: pl._seam_and_blend(imgs, m, cfg, src_w=W),
               f32(2, *CANVAS, 3), booll(2, *CANVAS))
    if "front" in want:
        timeit("stitch_pair_front",
               lambda a, b, k: pl.stitch_pair_front_impl(a, b, k, cfg),
               f32(H, W, 3), f32(H, W, 3),
               key)
    if "full" in want:
        timeit("stitch_pair_full",
               lambda a, b, k: pl.stitch_pair_impl(a, b, k, cfg),
               f32(H, W, 3), f32(H, W, 3),
               key)


if __name__ == "__main__":
    main()

def timeit2(name, fn, *args):
    import jax
    t0 = time.perf_counter()
    jaxpr = jax.make_jaxpr(fn)(*args)
    t1 = time.perf_counter()
    n_eqns = len(jaxpr.eqns)
    t2 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t3 = time.perf_counter()
    print(f"{name:22s} trace {t1-t0:7.2f}s  lower {t3-t2:7.2f}s  eqns {n_eqns}",
          flush=True)
