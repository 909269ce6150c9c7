"""Attribute batched-1080p flatness (round-4 verdict weak #3).

Captures jax.profiler traces of the single-pair stitch program and the
B-pair batched program on the real TPU, then sums per-op DEVICE time from
the trace protos. If the batched program's device time per pair ~= the
single-pair device time, the chip is saturated at one pair (batching can
only hide dispatch, which the tunnel already exaggerates); if it is much
lower, time is going somewhere else (host, transfers, serialization) and
batching should win.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_batched.py [B]
Writes traces under /tmp/ist_prof_{single,batched}/ and prints a summary.
"""

from __future__ import annotations

import functools
import glob
import gzip
import json
import os
import sys
import time

import numpy as np


def device_time_by_category(trace_dir: str) -> dict:
    """Parse the newest trace.json.gz: sum device-lane event durations by
    op-name prefix. Returns {category: total_ms}."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return {}
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device lanes: pid whose process_name mentions the accelerator
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = str(e.get("args", {}).get("name", "")).lower()
            if ("tpu" in nm or "device" in nm or "xla" in nm) \
                    and "host" not in nm:
                dev_pids.add(e.get("pid"))
    cats: dict[str, float] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur_ms = float(e.get("dur", 0)) / 1e3
        name = e.get("name", "?")
        # strip fusion suffixes: "fusion.123" -> "fusion"
        base = name.split(".")[0].split("(")[0][:40]
        cats[base] = cats.get(base, 0.0) + dur_ms
        total += dur_ms
    cats["__total__"] = total
    return cats


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp

    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.parallel.batch import stitch_pairs_batched
    from imagestitch_tpu.pipeline import stitch_pair_impl
    from imagestitch_tpu.utils.io import synthetic_pair

    float(jax.jit(lambda x: x.sum())(jnp.ones((8,))))  # tunnel bootstrap
    cfg = PipelineConfig()
    key = jax.random.key(0)
    i1, i2, _ = synthetic_pair(1080, 1920, overlap=0.4, seed=0)
    a1 = jnp.asarray(i1, jnp.float32)
    a2 = jnp.asarray(i2, jnp.float32)
    pair = np.stack([i1, i2]).astype(np.float32)
    pairs = jnp.asarray(np.broadcast_to(pair, (B,) + pair.shape).copy())
    keys = jax.random.split(key, B)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def single(x, y, k, cfg):
        p, v, c, mt = stitch_pair_impl(x, y, k, cfg=cfg)
        return p.sum() + v.sum() + c.sum() + mt["num_inliers"]

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def batched(ps, ks, cfg):
        p, v, c, mt = stitch_pairs_batched(ps, ks, cfg)
        return p.sum() + v.sum() + c.sum() + mt["num_inliers"].sum()

    # warm (compile) outside the trace
    t0 = time.perf_counter()
    float(single(a1, a2, key, cfg))
    print(f"single compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    float(batched(pairs, keys, cfg))
    print(f"batched compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    for name, fn in (("single", lambda: float(single(a1, a2, key, cfg))),
                     ("batched", lambda: float(batched(pairs, keys, cfg)))):
        d = f"/tmp/ist_prof_{name}"
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            for _ in range(3):
                fn()
        cats = device_time_by_category(d)
        per3 = cats.get("__total__", 0.0)
        npairs = 3 * (B if name == "batched" else 1)
        print(f"\n== {name}: device total {per3:.1f} ms over 3 calls "
              f"-> {per3 / max(npairs, 1):.2f} ms/pair ==")
        top = sorted(((v, k) for k, v in cats.items() if k != "__total__"),
                     reverse=True)[:12]
        for v, k in top:
            print(f"  {v/3:8.2f} ms/call  {k}")


if __name__ == "__main__":
    main()
