"""Same-process device-time A/B of warp-kernel variants.

Compares the shipped kernel against row_rebase on the bench's 2x1080p
rotation geometry. Decision basis is DEVICE time from jax.profiler
traces: wall medians through the dev tunnel swing +-3 ms within minutes
(observed non-monotone across variants), while device sums repeat
within ~1% across processes.

Round-5 verdicts on this geometry (device ms; variants since removed
from the kernel — see ROADMAP "warp kernel device-time study"):

  shipped kernel              16.5
  row_rebase                  23.4   (round-3 wall rejection confirmed)
  accum="block" (8-row block
    shifts + sublane bcasts)  17.4   (shift savings eaten by broadcasts)
  dense rung ladder (2-apart) 51.5   (untaken pl.when rungs are NOT
                                      free — ladder size is a real cost)
  slab-DMA height rungs       16.6   (DMA is 0.14 ms — nothing to save)
  hat-weight hoist            16.5   (Mosaic already hoists; kept for
                                      clarity)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_warp_accum.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from profile_batched import device_time_by_category


def median_ms(fn, lat, reps=9):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


def device_ms(fn, tag, reps=6, key="_warp_batched_jit"):
    """Per-call device time of the named XLA program span. The category
    table double-counts nested spans (jit_X wraps X), so one leaf
    program name is summed, not __total__."""
    d = f"/tmp/ist_ab_warp/{tag}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    fn()
    with jax.profiler.trace(d):
        for _ in range(reps):
            fn()
    cats = device_time_by_category(d)
    return cats.get(key, 0.0) / reps


def main():
    from imagestitch_tpu.ops.pallas_warp import pallas_warp_batched
    from imagestitch_tpu.warp.warper import roi_bounds
    from imagestitch_tpu.warp.projectors import _camera_mats
    from imagestitch_tpu.utils.io import synthetic_rotation_pair

    H, W = 1080, 1920
    r1, r2, _, _ = synthetic_rotation_pair(H, W, yaw_deg=10.0, seed=0)
    imgs = jnp.asarray(np.stack([r1, r2]), jnp.float32)
    f = 0.9 * W
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    ang = np.deg2rad(10.0)
    ca, sa = np.cos(ang), np.sin(ang)
    Rr = jnp.asarray([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], jnp.float32)
    tilt = np.deg2rad(3.0)
    ct, st = np.cos(tilt), np.sin(tilt)
    Rt = jnp.asarray([[ct, -st, 0], [st, ct, 0], [0, 0, 1]], jnp.float32)
    Rs = [jnp.eye(3, dtype=jnp.float32), Rr @ Rt]
    bounds = [roi_bounds(K, R, f, (H, W), "cylindrical") for R in Rs]
    u0 = jnp.floor(jnp.minimum(bounds[0][0], bounds[1][0]))
    v0 = jnp.floor(jnp.minimum(bounds[0][1], bounds[1][1]))
    corner = jnp.stack([u0, v0]).astype(jnp.int32)
    k_rinvs = jnp.stack([_camera_mats(K, R)[1] for R in Rs])
    roi_uvs = jnp.stack([jnp.stack(b) for b in bounds])
    canvas = (1480, 3456)
    corners = jnp.broadcast_to(corner, (2, 2))

    trivial = jax.jit(lambda x: jnp.sum(x))
    z = jnp.ones((8,), jnp.float32)
    float(trivial(z))
    lat = median_ms(lambda: float(trivial(z)), 0.0, reps=9) / 1e3
    print(f"tunnel latency {lat * 1e3:.1f} ms "
          f"backend={jax.default_backend()}", file=sys.stderr)

    variants = [("row", dict()),
                ("row_rebase", dict(row_rebase=True))]
    ref = None
    for name, kw in variants:
        def run(kw=kw):
            return pallas_warp_batched(imgs, k_rinvs, f, corners, roi_uvs,
                                       canvas, "cylindrical", **kw)
        t0 = time.perf_counter()
        o, v = jax.block_until_ready(run())
        compile_s = time.perf_counter() - t0
        on, vn = np.asarray(o), np.asarray(v)
        if ref is None:
            ref = (on, vn)
            status = "reference"
        elif name == "row_rebase":
            both = ref[1] & vn
            d = np.abs(ref[0] - on)[both].max() if both.any() else 0.0
            status = f"shared-valid max|d|={d:.3g}"
        else:
            same = (np.array_equal(ref[0], on)
                    and np.array_equal(ref[1], vn))
            status = "bit-identical" if same else (
                f"MISMATCH max|d|={np.abs(ref[0] - on).max():.3g}")

        def one(run=run):
            o, v = run()
            return float(o[0, 0, 0, 0] + v[0, 0, 0])
        ms = median_ms(one, lat)
        dms = device_ms(one, name)
        print(f"  accum={name:>10}: wall {ms:7.2f} ms  device {dms:7.2f} "
              f"ms  compile {compile_s:5.1f}s  [{status}]")


if __name__ == "__main__":
    main()
