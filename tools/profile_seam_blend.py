"""Split the pair program's seam+blend tail into seam vs blend on TPU.

profile_pair_stages.py attributes ~13.6 ms of the rotation-scene pair to
seam+blend. This times, on the REAL front outputs (warped canvases +
masks from stitch_pair_front at 2x1080p):

  S+B  _seam_and_blend (DP seam resolution + dilate + feather blend)
  B    _blend_resolved on precomputed seam masks (dilate + feather only)

so seam ~= (S+B) - B. Single-dispatch scalar-readback programs, tunnel
RTT subtracted.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_seam_blend.py
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
    from imagestitch_tpu.pipeline import (_blend_resolved, _seam_and_blend,
                                          stitch_pair_front)
    from imagestitch_tpu.seam.dp import dp_seam_pair
    from imagestitch_tpu.utils.io import synthetic_rotation_pair

    cfg = PipelineConfig()
    key = jax.random.key(0)
    r1, r2, _, _ = synthetic_rotation_pair(1080, 1920, yaw_deg=10.0, seed=0)

    trivial = jax.jit(lambda x: jnp.sum(x))
    z = jnp.ones((8,), jnp.float32)
    float(trivial(z))
    lat = median_ms(lambda: float(trivial(z)), 0.0, reps=9) / 1e3
    print(f"tunnel latency {lat*1e3:.1f} ms backend={jax.default_backend()}",
          file=sys.stderr)

    t0 = time.perf_counter()
    warped, masks, corner, mt = stitch_pair_front(
        jnp.asarray(r1, jnp.float32), jnp.asarray(r2, jnp.float32), key, cfg)
    jax.block_until_ready(masks)
    print(f"front compile+run {time.perf_counter()-t0:.1f}s "
          f"h_valid={bool(mt['h_valid'])}", file=sys.stderr)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def seam_blend(w, m, cfg):
        p, v = _seam_and_blend(w, m, cfg, src_w=1920, src_h=1080)
        return p.sum() + v.sum()

    # precomputed seam masks for the blend-only program (computed once,
    # OUTSIDE the timed region)
    fac = 1.1
    max_w = -(-int(round(fac * 1920)) // 128) * 128
    sm1, sm2, _ = dp_seam_pair(
        warped[0], warped[1], masks[0], masks[1], False,
        max_overlap_w=max_w, orient="vertical", scale=cfg.seam.dp_scale)
    seam_masks = jnp.stack([sm1, sm2])
    jax.block_until_ready(seam_masks)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def blend_only(w, sm, m, cfg):
        p, v = _blend_resolved(w, sm, m, cfg)
        return p.sum() + v.sum()

    results = {}
    for name, fn in (
            ("seam+blend", lambda: float(seam_blend(warped, masks, cfg))),
            ("blend only (dilate+feather)",
             lambda: float(blend_only(warped, seam_masks, masks, cfg)))):
        t0 = time.perf_counter()
        fn()
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ms = median_ms(fn, lat)
        results[name] = ms
        print(f"{name}: {ms:.2f} ms", file=sys.stderr)

    vals = list(results.values())
    print(f"\nseam (DP resolution) ~= {vals[0]-vals[1]:.2f} ms, "
          f"blend ~= {vals[1]:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
