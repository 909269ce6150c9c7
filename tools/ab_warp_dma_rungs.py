"""Same-process A/B of the warp kernel's slab-DMA height rungs.

Compares dma_rungs=(SLAB_H,) (the fixed-height kernel) against the
runged variants on the bench's 2x1080p rotation geometry: asserts
bit-identical outputs on the real TPU, then medians the wall time of a
scalar-readback call for each (tunnel RTT subtracted). Same process so
tunnel drift cannot masquerade as a kernel delta (tools/README.md).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_warp_dma_rungs.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def median_ms(fn, lat, reps=9):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


def main():
    from imagestitch_tpu.ops.pallas_warp import pallas_warp_batched, SLAB_H
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

    variants = [(SLAB_H,), (32, SLAB_H), (24, 32, SLAB_H),
                (16, 24, 32, SLAB_H)]
    ref = None
    for rungs in variants:
        def run(rungs=rungs):
            return pallas_warp_batched(imgs, k_rinvs, f, corners, roi_uvs,
                                       canvas, "cylindrical",
                                       dma_rungs=rungs)
        o, v = jax.block_until_ready(run())
        on, vn = np.asarray(o), np.asarray(v)
        if ref is None:
            ref = (on, vn)
            status = "reference"
        else:
            same = (np.array_equal(ref[0], on)
                    and np.array_equal(ref[1], vn))
            status = "bit-identical" if same else (
                f"MISMATCH max|d|={np.abs(ref[0] - on).max():.3g}")
        def one(run=run):
            o, v = run()
            return float(o[0, 0, 0, 0] + v[0, 0, 0])
        ms = median_ms(one, lat)
        print(f"  dma_rungs={str(rungs):>18}: {ms:7.2f} ms  [{status}]")


if __name__ == "__main__":
    main()
