"""Per-fusion profile of the flagship stitch program.

Captures a jax.profiler trace of one warmed stitch_pair dispatch and prints
the top ops by accumulated duration — the workflow that produced the
round-2/3 perf notes in ops/pallas_warp.py and ops/image.py (the axon
tunnel supports jax.profiler; block_until_ready alone is NOT a completion
barrier there, so the traced call ends in a scalar readback).

  python tools/profile_stitch.py --size 1080x1920 --scene rotation
  python tools/profile_stitch.py --size 480x640 --top 30 --keep

Works on any backend (CPU shows XLA:CPU thunks; TPU shows device fusions).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import tempfile
import time


def trace_events(trace_dir: str):
    """Yield (name, dur_us) from every perfetto trace file under dir."""
    pats = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                     recursive=True)
    for p in pats:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                yield ev.get("name", "?"), float(ev["dur"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--scene", default="rotation",
                    choices=["rotation", "translation"])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir (prints its path)")
    args = ap.parse_args()

    import functools

    import numpy as np
    import jax

    # in this jax build the JAX_PLATFORMS env var alone does not flip the
    # platform (see tests/conftest.py) — mirror it into the config BEFORE
    # first device use, or a requested-CPU run initializes the tunneled
    # axon backend anyway
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.pipeline import stitch_pair_impl
    from imagestitch_tpu.utils.io import (synthetic_pair,
                                          synthetic_rotation_pair)

    H, W = (int(x) for x in args.size.split("x"))
    if args.scene == "rotation":
        i1, i2, _, _ = synthetic_rotation_pair(H, W, yaw_deg=10.0, seed=0)
    else:
        i1, i2, _ = synthetic_pair(H, W, overlap=0.4, seed=0)
    a1 = jnp.asarray(np.asarray(i1), jnp.float32)
    a2 = jnp.asarray(np.asarray(i2), jnp.float32)
    key = jax.random.key(0)
    cfg = PipelineConfig()

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def f(x, y, k, cfg):
        p, v, c, m = stitch_pair_impl(x, y, k, cfg=cfg)
        return p.sum() + v.sum() + c.sum() + m["num_inliers"]

    t0 = time.perf_counter()
    float(f(a1, a2, key, cfg))  # compile + warm
    print(f"first call: {time.perf_counter() - t0:.1f}s "
          f"backend={jax.default_backend()}")

    tdir = tempfile.mkdtemp(prefix="stitch_trace_")
    with jax.profiler.trace(tdir):
        s = float(f(a1, a2, key, cfg))  # scalar readback = true barrier
    print(f"traced call checksum {s:.1f}")

    agg: dict[str, list[float]] = {}
    for name, dur in trace_events(tdir):
        acc = agg.setdefault(name, [0.0, 0.0])
        acc[0] += dur
        acc[1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    total = sum(v[0] for v in agg.values())
    print(f"\n{'total us':>10}  {'calls':>6}  name   "
          f"(sum over all tracks: {total:.0f} us)")
    for name, (dur, cnt) in rows:
        print(f"{dur:10.0f}  {int(cnt):6d}  {name[:100]}")
    if args.keep:
        print(f"\ntrace kept at {tdir}")
    else:
        import shutil
        shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
