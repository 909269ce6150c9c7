"""Host-side model of the Pallas warp kernel's per-chunk windows.

The kernel's accumulation cost per live chunk is ~ vspread x nk(qspread)
x C vector ops (ops/pallas_warp.py phase 2). This experiment replicates
the kernel's phase-1 window math in NumPy on the bench's 2x1080p
rotation-scene geometry (bench.py warp_variants) and reports the
distribution of

  - vspread / qspread as the shipped kernel computes them,
  - the residual windows if the slab were SHEARED before accumulation:
      * horizontal per-row shear u(dr) = round(s*dr)   (row_rebase model)
      * vertical per-lane shear  v(j)  = round(t*j)    (proposed)
      * both,

plus the implied accumulation-cost ratio (sum over live chunks of
vspread * nk, where nk is the kernel's rung ladder rounded up). This is
pure map math -- no TPU, no Pallas -- so it runs anywhere and the
decision data is exact for the geometry modeled.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_warp_spread.py
"""

from __future__ import annotations

import numpy as np

CHUNK_H, CHUNK_W = 8, 128
SLAB_H, SLAB_W = 48, 384
QSPAN = 48


def rungs_cost(qspread, rungs):
    """nk the kernel would run for this qspread (first rung >= qspread)."""
    for nk in rungs:
        if qspread <= nk:
            return nk
    return rungs[-1]


def chunk_stats(ly, lx, ok):
    """Replicate phase-1 rmin/vspread/qbase/qspread for one chunk."""
    if not ok.any():
        return None
    lyv = np.where(ok, ly, np.inf)
    rmin = int(np.clip(np.floor(lyv.min()), 0, SLAB_H - 1))
    vmax = np.where(ok, ly, -1.0).max()
    vspread = int(np.clip(np.ceil(vmax) - rmin + 1, 0, SLAB_H - rmin))
    jlane = np.arange(CHUNK_W)[None, :].repeat(CHUNK_H, 0)
    qrel = np.floor(lx).astype(np.int64) - jlane
    qmin = int(np.where(ok, qrel, 2**30).min())
    qmax = int(np.where(ok, qrel, -(2**30)).max())
    qspread = int(np.clip(qmax - qmin + 2, 0, QSPAN))
    return rmin, vspread, qspread, qrel, lyv


def sheared_spreads(ly, lx, ok, rmin):
    """Residual windows after per-row and/or per-lane linear shears.

    Fits the chunk's d(lx)/d(ly) slope s (horizontal drift per source
    row, as row_rebase does) and d(ly)/d(lane) slope t (vertical tilt
    per lane, the proposed shear) by least squares over valid pixels,
    then reports the residual integer window sizes with the kernel's
    rounding slop model (+|slope|+0.5 guard each side).
    """
    jlane = np.arange(CHUNK_W)[None, :].repeat(CHUNK_H, 0)
    qrel = np.floor(lx) - jlane
    lyv = ly - rmin

    m = ok.ravel()
    A_s = np.c_[lyv.ravel()[m], np.ones(m.sum())]
    s = np.linalg.lstsq(A_s, qrel.ravel()[m], rcond=None)[0][0]
    A_t = np.c_[jlane.ravel()[m].astype(float), np.ones(m.sum())]
    t = np.linalg.lstsq(A_t, lyv.ravel()[m], rcond=None)[0][0]

    # horizontal residual window (row_rebase): qrel - s*lyv
    res_h = np.where(ok, qrel - s * lyv, np.nan)
    slop_h = abs(s) + 0.5
    qspread_h = int(np.clip(np.ceil(np.nanmax(res_h) + slop_h)
                            - np.floor(np.nanmin(res_h) - slop_h) + 2,
                            0, QSPAN))

    # vertical residual window: lyv - round(t*j) per lane
    vshift = np.floor(t * jlane + 0.5)
    res_v = np.where(ok, lyv - vshift, np.nan)
    vspread_v = int(np.clip(np.ceil(np.nanmax(res_v))
                            - np.floor(np.nanmin(res_v)) + 1, 0, SLAB_H))

    # both shears: the horizontal model should use the SHEARED row index
    # (the accumulation loop walks residual rows after the vertical
    # shear), so refit s against res_v's row coordinate
    A_s2 = np.c_[np.where(ok, res_v, 0.0).ravel()[m], np.ones(m.sum())]
    s2 = np.linalg.lstsq(A_s2, qrel.ravel()[m], rcond=None)[0][0]
    res_h2 = np.where(ok, qrel - s2 * res_v, np.nan)
    slop_h2 = abs(s2) + 0.5
    qspread_b = int(np.clip(np.ceil(np.nanmax(res_h2) + slop_h2)
                            - np.floor(np.nanmin(res_h2) - slop_h2) + 2,
                            0, QSPAN))
    return qspread_h, vspread_v, qspread_b, s, t


def backward_map(u, v, k_rinv, scale):
    us, vs = u / scale, v / scale
    X, Y, Z = np.sin(us), vs, np.cos(us)
    px = k_rinv[0, 0] * X + k_rinv[0, 1] * Y + k_rinv[0, 2] * Z
    py = k_rinv[1, 0] * X + k_rinv[1, 1] * Y + k_rinv[1, 2] * Z
    pz = k_rinv[2, 0] * X + k_rinv[2, 1] * Y + k_rinv[2, 2] * Z
    ray_ok = pz > 0
    pzs = np.where(np.abs(pz) < 1e-12, 1e-12, pz)
    return px / pzs, py / pzs, ray_ok


def main():
    import jax.numpy as jnp
    from imagestitch_tpu.warp.warper import roi_bounds
    from imagestitch_tpu.warp.projectors import _camera_mats

    H, W = 1080, 1920
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
    u0 = float(np.floor(min(float(bounds[0][0]), float(bounds[1][0]))))
    v0 = float(np.floor(min(float(bounds[0][1]), float(bounds[1][1]))))
    Hc, Wc = 1480, 3456

    rungs_base = [8, 12, 16, 20, 24, 32, QSPAN]
    rungs_rb = [4] + rungs_base

    for img in (0, 1):
        k_rinv = np.asarray(_camera_mats(K, Rs[img])[1], np.float64)
        u0b, v0b, u1b, v1b = [float(x) for x in bounds[img]]

        rows = []
        cost = dict(base=0, rb=0, vshear=0, both=0)
        for ci in range(0, Hc, CHUNK_H):
            for cj in range(0, Wc, CHUNK_W):
                oy = ci + np.arange(CHUNK_H)[:, None] + v0
                ox = cj + np.arange(CHUNK_W)[None, :] + u0
                u = np.broadcast_to(ox, (CHUNK_H, CHUNK_W)).astype(float)
                v = np.broadcast_to(oy, (CHUNK_H, CHUNK_W)).astype(float)
                xs, ys, ray_ok = backward_map(u, v, k_rinv, f)
                ok = (ray_ok
                      & (u >= u0b - 1) & (u <= u1b + 1)
                      & (v >= v0b - 1) & (v <= v1b + 1)
                      & (xs >= 0) & (xs <= W - 1)
                      & (ys >= 0) & (ys <= H - 1))
                if not ok.any():
                    continue
                xs_min = np.where(ok, xs, np.inf).min()
                ys_min = np.where(ok, ys, np.inf).min()
                sy0 = np.clip(np.floor(ys_min) - 1, 0,
                              max(((H + 7) // 8) * 8 - SLAB_H, 0))
                sx0 = np.clip(np.floor(xs_min) - 1, 0,
                              max(((W + 127) // 128) * 128 - SLAB_W, 0))
                sy0 = int(sy0) // 8 * 8
                sx0 = int(sx0) // 128 * 128
                ly, lx = ys - sy0, xs - sx0
                ok = ok & (lx <= SLAB_W - 2) & (ly <= SLAB_H - 2)
                if not ok.any():
                    continue
                st_ = chunk_stats(np.where(ok, ly, -10.0),
                                  np.where(ok, lx, -10.0), ok)
                rmin, vspread, qspread, _, _ = st_
                qs_h, vs_v, qs_b, s, t = sheared_spreads(ly, lx, ok, rmin)
                rows.append((vspread, qspread, qs_h, vs_v, qs_b, s, t))
                cost["base"] += vspread * rungs_cost(qspread, rungs_base)
                cost["rb"] += vspread * rungs_cost(qs_h, rungs_rb)
                cost["vshear"] += vs_v * rungs_cost(qspread, rungs_base)
                cost["both"] += vs_v * rungs_cost(qs_b, rungs_rb)

        r = np.array([x[:5] for x in rows], float)
        names = ["vspread", "qspread", "qspread_rowshear",
                 "vspread_laneshear", "qspread_bothshear"]
        print(f"image {img}: {len(rows)} live chunks")
        for i, n in enumerate(names):
            col = r[:, i]
            print(f"  {n:>18}: median {np.median(col):5.1f}  "
                  f"p90 {np.percentile(col, 90):5.1f}  "
                  f"max {col.max():5.0f}")
        sl = np.array([x[5] for x in rows])
        tl = np.array([x[6] for x in rows])
        print(f"  slopes: |s| median {np.median(np.abs(sl)):.2f} "
              f"max {np.abs(sl).max():.2f}; |t| median "
              f"{np.median(np.abs(tl)):.3f} max {np.abs(tl).max():.3f}")
        base = cost["base"]
        for kname in ("base", "rb", "vshear", "both"):
            print(f"  accum-cost[{kname:>6}] = {cost[kname]:>9}  "
                  f"(x{cost[kname] / base:.2f} of base)")


if __name__ == "__main__":
    main()
