"""A/B: batched (vmapped) vs sequential pair detects, by DEVICE time.

Round-5 wall-clock comparisons across bench runs are confounded by +-30%
tunnel/day variance; device-time totals from jax.profiler traces are not.
Builds the 2x1080p pair program both ways (pipeline._BATCH_PAIR_DETECT
flag), traces 3 calls of each, and prints per-call device totals.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_pair_detect.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_batched import device_time_by_category  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from imagestitch_tpu import pipeline as pl
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.utils.io import synthetic_rotation_pair

    entry_flag = pl._BATCH_PAIR_DETECT
    float(jax.jit(lambda x: x.sum())(jnp.ones((8,))))  # tunnel bootstrap
    cfg = PipelineConfig()
    key = jax.random.key(0)
    r1, r2, _, _ = synthetic_rotation_pair(1080, 1920, yaw_deg=10.0, seed=0)
    a1 = jnp.asarray(r1, jnp.float32)
    a2 = jnp.asarray(r2, jnp.float32)

    for flag in (True, False):
        pl._BATCH_PAIR_DETECT = flag

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f(x, y, k, cfg, _v=flag):  # _v: distinct cache key per variant
            p, v, c, mt = pl.stitch_pair_impl(x, y, k, cfg=cfg)
            return p.sum() + v.sum() + c.sum() + mt["num_inliers"]

        t0 = time.perf_counter()
        float(f(a1, a2, key, cfg))
        print(f"batched={flag}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        d = f"/tmp/ist_ab_{'batched' if flag else 'seq'}"
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            for _ in range(3):
                float(f(a1, a2, key, cfg))
        cats = device_time_by_category(d)
        total = cats.get("__total__", 0.0) / 3
        print(f"batched={flag}: device total {total:.2f} ms/call",
              file=sys.stderr)
        top = sorted(((v, k) for k, v in cats.items() if k != "__total__"),
                     reverse=True)[:8]
        for v, k in top:
            print(f"  {v/3:8.2f} ms/call  {k}", file=sys.stderr)
    pl._BATCH_PAIR_DETECT = entry_flag  # restore the module default


if __name__ == "__main__":
    main()
