"""Stage-level timing of the 2x1080p pair program on the real TPU.

Four cumulative single-dispatch programs (each ends in one scalar
readback; tunnel latency subtracted), so the deltas attribute the
pipeline's wall time per stage group:

  A  detect both images (gray + ORB detect, as the pair program runs it)
  B  A + match + RANSAC homography            (delta = matcher stage)
  C  stitch_pair_front: + cameras/BA + warp + exposure
  D  full stitch_pair: + seam + blend          (delta = seam/blend)

C and D are the very programs bench.py compiles, so a warm persistent
cache serves them.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_pair_stages.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def median_ms(fn, lat, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


def main():
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.features import detect as detect_features
    from imagestitch_tpu.matching.matcher import match_pair
    from imagestitch_tpu.ops.image import rgb_to_gray
    from imagestitch_tpu.pipeline import stitch_pair_front, stitch_pair_impl
    from imagestitch_tpu.utils.io import synthetic_rotation_pair

    cfg = PipelineConfig()
    key = jax.random.key(0)
    r1, r2, _, _ = synthetic_rotation_pair(1080, 1920, yaw_deg=10.0, seed=0)
    a1 = jnp.asarray(r1, jnp.float32)
    a2 = jnp.asarray(r2, jnp.float32)

    trivial = jax.jit(lambda x: jnp.sum(x))
    z = jnp.ones((8,), jnp.float32)
    float(trivial(z))
    lat = median_ms(lambda: float(trivial(z)), 0.0, reps=9) / 1e3
    print(f"tunnel latency {lat*1e3:.1f} ms backend={jax.default_backend()}",
          file=sys.stderr)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def stage_a(x, y, cfg):
        f1 = detect_features(rgb_to_gray(x), cfg.detector)
        f2 = detect_features(rgb_to_gray(y), cfg.detector)
        return (f1.xy.sum() + f1.descriptors.astype(jnp.float32).sum()
                + f1.valid.sum() + f2.xy.sum()
                + f2.descriptors.astype(jnp.float32).sum() + f2.valid.sum())

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def stage_b(x, y, k, cfg):
        f1 = detect_features(rgb_to_gray(x), cfg.detector)
        f2 = detect_features(rgb_to_gray(y), cfg.detector)
        mi = match_pair(f1, f2, k, 0, 1, cfg.matcher, cfg.ransac)
        return (mi.H.sum() + mi.num_inliers + mi.confidence
                + mi.inliers.sum())

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def stage_c(x, y, k, cfg):
        warped, masks, corner, mt = stitch_pair_front.__wrapped__(
            x, y, k, cfg)
        return (warped.sum() + masks.sum() + corner.sum()
                + mt["num_inliers"])

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def stage_d(x, y, k, cfg):
        p, v, c, mt = stitch_pair_impl(x, y, k, cfg=cfg)
        return p.sum() + v.sum() + c.sum() + mt["num_inliers"]

    results = {}
    for name, fn in (
            ("A detect", lambda: float(stage_a(a1, a2, cfg))),
            ("B +match+ransac", lambda: float(stage_b(a1, a2, key, cfg))),
            ("C +cameras/BA+warp+exposure (front)",
             lambda: float(stage_c(a1, a2, key, cfg))),
            ("D +seam+blend (full)",
             lambda: float(stage_d(a1, a2, key, cfg)))):
        t0 = time.perf_counter()
        fn()
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ms = median_ms(fn, lat)
        results[name] = ms
        print(f"{name}: {ms:.2f} ms", file=sys.stderr)

    vals = list(results.values())
    print("\nstage deltas (rotation scene):", file=sys.stderr)
    print(f"  detect:                {vals[0]:7.2f} ms", file=sys.stderr)
    print(f"  match+ransac:          {vals[1]-vals[0]:7.2f} ms",
          file=sys.stderr)
    print(f"  cameras+warp+exposure: {vals[2]-vals[1]:7.2f} ms",
          file=sys.stderr)
    print(f"  seam+blend:            {vals[3]-vals[2]:7.2f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
