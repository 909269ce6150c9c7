"""Benchmark: end-to-end 2-image 1080p stitch latency on one TPU chip.

Target (BASELINE.md, driver-specified: the reference publishes no numbers):
< 50 ms per 1080p pair on one chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
vs_baseline = 50ms / measured  (>1 means faster than target).

Timing methodology: the dev environment reaches the TPU through a tunnel
whose block_until_ready acks before device completion and whose round-trip
latency is ~35-40 ms, so naive per-call timing is unusable. Instead K full
stitches are chained inside ONE jitted scan (each iteration's input is
perturbed by the previous result so XLA cannot CSE them) and a scalar
readback forces completion; per-stitch time = (wall - tunnel_latency) / K.
Extra per-stage numbers go to stderr so the driver's single-line contract
holds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.pipeline import stitch_pair_impl, stitch_pair_core
    from imagestitch_tpu.utils.io import synthetic_pair

    H, W = 1080, 1920
    img1, img2, shift = synthetic_pair(H, W, overlap=0.4, seed=0)
    a1 = jnp.asarray(img1, jnp.float32)
    a2 = jnp.asarray(img2, jnp.float32)
    cfg = PipelineConfig()
    key = jax.random.key(0)

    # correctness spot-check + warm the executable
    t0 = time.perf_counter()
    pano, valid, corner, metrics = stitch_pair_core(a1, a2, key, cfg)
    h_valid = bool(metrics["h_valid"])
    inliers = int(metrics["num_inliers"])
    print(f"first call (compile+run): {time.perf_counter() - t0:.1f}s "
          f"backend={jax.default_backend()} h_valid={h_valid} "
          f"inliers={inliers}", file=sys.stderr)
    if not h_valid:
        print(json.dumps({"metric": "stitch_2x1080p_latency", "value": -1.0,
                          "unit": "ms", "vs_baseline": 0.0}))
        return

    # measure tunnel readback latency with a trivial program
    triv = jax.jit(lambda x: x.sum())
    small = jnp.ones((8,))
    float(triv(small))
    lat = min(time_of(lambda: float(triv(small))) for _ in range(3))
    print(f"tunnel readback latency: {lat * 1e3:.1f}ms", file=sys.stderr)

    # per-call timing with a forced scalar readback (completion barrier the
    # tunnel cannot fake), tunnel latency subtracted
    def one():
        p, v, c, m = stitch_pair_core(a1, a2, key, cfg)
        return float(p[0, 0, 0]) + int(m["num_inliers"])

    one()  # warm
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        one()
        times.append((time.perf_counter() - t0 - lat) * 1e3)
    med = float(np.median(times))
    print(f"per-stitch ms: {[round(t, 1) for t in times]}", file=sys.stderr)

    print(json.dumps({
        "metric": "stitch_2x1080p_latency",
        "value": round(med, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / med, 3),
    }))


def time_of(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
