"""Attribute the Pallas warp kernel's time to its internal phases.

Pallas kernels are one opaque span in profiler traces, so phase costs
are measured by ABLATION: the kernel recompiles with one phase removed
(ops/pallas_warp.py `ablate` static arg — output garbage, timing valid)
and the delta vs the full kernel attributes that phase:

  full            the shipped kernel
  - accum         rung-ladder accumulation loops removed
  - roll          per-channel whole-slab dynamic rolls removed
  - dma           slab DMA start/wait removed (reads stale scratch)
  dead            every chunk fails the liveness test: grid + per-chunk
                  skeleton (SMEM zeroing, scalar reads) only

plus scaling probes: "noshift" (accumulation without the per-k lane
window slice), "k8"/"k16" (fixed shift-window size for every chunk),
"rb2"/"rb8" (row-block size).

Geometry = bench.py warp_variants (2x1080p rotation scene, cylindrical,
1480x3456 canvas). Wall medians AND per-call device time from
jax.profiler traces are printed; the device column is the decision
basis (wall through the tunnel mis-attributed this kernel's phases by
8 ms in round 5 — the attribution below is from the device column).

Round-5 device-time findings at this geometry (kernel total 16.5 ms):
accumulation rungs 13.4 / map eval ~2.3 / skeleton 0.8 / rolls 0.7 /
slab DMA 0.14. Inside the accumulation, the per-k lane-window slice is
~11.5 ms ("noshift") and cost is linear in the rung size at ~0.68 ms
per shift ("k8" vs "k16"); the FMA arithmetic itself is ~2 ms.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_warp_phases.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ab_warp_accum import device_ms


def median_ms(fn, lat, reps=9):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


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

    res = {}
    for ab in ("", "accum", "roll", "dma", "dead",
               "noshift", "k8", "k16", "rb2", "rb8"):
        def one(ab=ab):
            o, v = pallas_warp_batched(imgs, k_rinvs, f, corners, roi_uvs,
                                       canvas, "cylindrical", ablate=ab)
            return float(o[0, 0, 0, 0] + v[0, 0, 0])
        t0 = time.perf_counter()
        one()
        compile_s = time.perf_counter() - t0
        ms = median_ms(one, lat)
        dms = device_ms(one, f"ab_{ab or 'full'}")
        res[ab or "full"] = dms
        print(f"  ablate={ab or 'full':>6}: wall {ms:7.2f} ms  "
              f"device {dms:7.2f} ms (compile {compile_s:.1f}s)")

    full = res["full"]
    print("phase attribution (delta vs full):")
    for ab, label in (("accum", "accumulation rungs"),
                      ("roll", "slab rolls"),
                      ("dma", "slab DMA")):
        print(f"  {label:>20}: {full - res[ab]:7.2f} ms")
    print(f"  {'skeleton (dead)':>20}: {res['dead']:7.2f} ms")
    print(f"  {'map eval + rest':>20}: "
          f"{res['accum'] - res['dead']:7.2f} ms  "
          "(full-minus-accum minus skeleton includes DMA+roll+map)")


if __name__ == "__main__":
    main()
