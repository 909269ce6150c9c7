"""Benchmark: end-to-end 2-image 1080p stitch latency on one TPU chip.

Target (BASELINE.md, driver-specified: the reference publishes no numbers):
< 50 ms per 1080p pair on one chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
vs_baseline = 50ms / measured  (>1 means faster than target).

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
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.pipeline import stitch_pair_core
    from imagestitch_tpu.utils.io import synthetic_pair

    H, W = 1080, 1920
    img1, img2, shift = synthetic_pair(H, W, overlap=0.4, seed=0)
    a1 = jnp.asarray(img1, jnp.float32)
    a2 = jnp.asarray(img2, jnp.float32)
    cfg = PipelineConfig()
    key = jax.random.key(0)

    t0 = time.perf_counter()
    out = stitch_pair_core(a1, a2, key, cfg)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"compile: {compile_s:.1f}s  backend={jax.default_backend()}",
          file=sys.stderr)

    h_valid = bool(out[3]["h_valid"])
    inliers = int(out[3]["num_inliers"])
    print(f"h_valid={h_valid} inliers={inliers}", file=sys.stderr)

    times = []
    for i in range(10):
        t0 = time.perf_counter()
        out = stitch_pair_core(a1, a2, key, cfg)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(times))
    print(f"times_ms={[round(t, 2) for t in times]}", file=sys.stderr)

    print(json.dumps({
        "metric": "stitch_2x1080p_latency",
        "value": round(med, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / med, 3),
    }))


if __name__ == "__main__":
    main()
