"""Benchmark: end-to-end 2-image 1080p stitch latency on one TPU chip.

Target (BASELINE.md, driver-specified: the reference publishes no numbers):
< 50 ms per 1080p pair on one chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
vs_baseline = 50ms / measured  (>1 means faster than target).

Timing methodology (per-call): the dev environment reaches the TPU through a
tunnel whose block_until_ready acks before device completion, so only a
scalar readback is a true completion barrier. Each measured call is ONE
jitted dispatch returning ONE scalar that depends on every output (full pano
sum + metrics, so XLA cannot dead-code-eliminate any stage), timed
wall-clock; the separately measured tunnel round-trip latency of that same
scalar readback on a trivial program is subtracted. Two scenes are measured
— a pure x-translation pair and a rotation+perspective pair (10 deg yaw +
pitch/roll, ground-truth homography known) — and the WORST median of the two
is reported, so the headline is not translation-only.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.pipeline import stitch_pair_impl
    from imagestitch_tpu.utils.io import synthetic_pair, synthetic_rotation_pair

    H, W = 1080, 1920
    cfg = PipelineConfig()
    key = jax.random.key(0)

    t1, t2, _ = synthetic_pair(H, W, overlap=0.4, seed=0)
    r1, r2, H_true, _ = synthetic_rotation_pair(H, W, yaw_deg=10.0, seed=0)
    scenes = {
        "translation": (jnp.asarray(t1, jnp.float32),
                        jnp.asarray(t2, jnp.float32)),
        "rotation": (jnp.asarray(r1, jnp.float32),
                     jnp.asarray(r2, jnp.float32)),
    }

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def bench_fn(a1, a2, key, cfg):
        p, v, c, m = stitch_pair_impl(a1, a2, key, cfg=cfg)
        # one scalar depending on ALL outputs: no DCE, one readback
        return (p.sum() + v.sum() + c.sum()
                + m["num_inliers"] + m["confidence"]), m

    # correctness spot-check + warm the executable (both scenes share one
    # compiled program: same static shapes)
    t0 = time.perf_counter()
    s, m = bench_fn(*scenes["translation"], key, cfg)
    h_valid = bool(m["h_valid"])
    inliers = int(m["num_inliers"])
    print(f"first call (compile+run): {time.perf_counter() - t0:.1f}s "
          f"backend={jax.default_backend()} h_valid={h_valid} "
          f"inliers={inliers}", file=sys.stderr)
    s2, m2 = bench_fn(*scenes["rotation"], key, cfg)
    rot_valid = bool(m2["h_valid"])
    print(f"rotation scene: h_valid={rot_valid} "
          f"inliers={int(m2['num_inliers'])}", file=sys.stderr)
    if not (h_valid and rot_valid):
        print(json.dumps({"metric": "stitch_2x1080p_latency", "value": -1.0,
                          "unit": "ms", "vs_baseline": 0.0}))
        return

    # measure tunnel readback latency with a trivial program
    triv = jax.jit(lambda x: x.sum())
    small = jnp.ones((8,))
    float(triv(small))
    lat = min(time_of(lambda: float(triv(small))) for _ in range(3))
    print(f"tunnel readback latency: {lat * 1e3:.1f}ms", file=sys.stderr)

    medians = {}
    for name, (a1, a2) in scenes.items():
        def one():
            s, m = bench_fn(a1, a2, key, cfg)
            return float(s)  # single scalar readback = single barrier
        one()  # warm
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            one()
            times.append((time.perf_counter() - t0 - lat) * 1e3)
        medians[name] = float(np.median(times))
        print(f"{name}: per-stitch ms {[round(t, 1) for t in times]}",
              file=sys.stderr)

    med = max(medians.values())  # worst scene is the headline
    print(f"medians: {medians}", file=sys.stderr)
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
