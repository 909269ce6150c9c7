"""Pallas TPU kernel: gather-free tiled bilinear warp.

The warp stage is the pipeline's hot op (SURVEY.md §3.4: buildMaps + remap).
XLA lowers `remap` to a scalarized HBM gather (~4 ns/index → ~65 ms for a
1080p cylindrical warp on v5e). This kernel exploits the SMOOTHNESS of
rotation-warp backward maps: each (8, 128) output chunk maps to a compact
source slab, so per chunk we

  1. evaluate the backward map analytically on the chunk's coordinates
     (VPU trig; matrices arrive in SMEM),
  2. DMA one (SLAB_H, SLAB_W) source slab from HBM at a dynamically
     computed origin (the map is smooth ⇒ the slab covers the whole chunk),
  3. resolve bilinear sampling as dense hat-weighted sums over the rows the
     chunk actually needs (dynamic fori_loop bound) and a window of static
     lane shifts (predicated KGROUP groups) — pure vector ALU work, ZERO
     gathers.

Each grid step processes a SUPER-TILE of SUB_R × SUB_C chunks, for three
reasons measured on v5e (round-2 profile: the one-chunk-per-step version
spent 35 ms on a 2×1080p rotation warp, ~4 ms of which was the actual
accumulation arithmetic):
  - per-grid-step overhead amortizes over 8 chunks (11.7k steps → 1.5k);
  - all 8 slab DMAs are issued BEFORE any chunk's accumulation starts, so
    HBM latency overlaps compute (the one-chunk version started its DMA and
    immediately waited on it);
  - chunks fully outside the image's ROI skip even the map trig: the ROI
    test is a rectangle test in pano (u, v) coords, which are affine in the
    chunk indices, so corner evaluation is exact.

Out-of-slab pixels (pathologically distorted chunks) and out-of-image
pixels fall out with zero accumulated weight and are reported invalid,
matching the XLA fallback's mask semantics. The vertical row window is a
dynamically-bounded loop up to the full slab height (the round-1 kernel's
static 16-row window silently invalidated pixels of strongly tilted maps
whose chunk spanned more source rows). The same kernel runs under interpret
mode on CPU for tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# chunk = the VPU-native working unit; super-tile = one grid step
CHUNK_H = 8
CHUNK_W = 128
SUB_R = 2          # chunk rows per super-tile
SUB_C = 4          # chunk cols per super-tile
SUPER_H = SUB_R * CHUNK_H      # 16
SUPER_W = SUB_C * CHUNK_W      # 512
NCH = SUB_R * SUB_C
SLAB_H = 48        # vertical slab capacity (source rows per chunk)
SLAB_W = 384       # horizontal slab capacity (source cols per chunk)
QSPAN = 48         # horizontal shift window (static lane shifts summed)
KGROUP = 8         # k-shift group size for runtime predication
# HBM DMA slice origins must be aligned to the (8, 128) tile grid (Mosaic
# constraint); slabs are over-sized so quantizing the origin down still
# covers the chunk's source extent

# SMEM per-chunk scalar slots
_S_ANYOK, _S_ROT, _S_RMIN, _S_VSPREAD, _S_QSPREAD, _S_SY0, _S_SX0 = range(7)


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _warp_kernel(mat_ref, misc_ref, src_ref, out_ref, valid_ref,
                 slabs_ref, tq_ref, lyv_ref, vmask_ref, acc_ref, scal_ref,
                 slope_ref, sems, *, row_rebase=False, ablate=""):
    """One (SUPER_H, SUPER_W) super-tile of image b.

    mat_ref: SMEM (N, 9) float32 — k_rinv (row-major) per image
    misc_ref: SMEM (N, 12) float32 — [scale, corner_x, corner_y, kind,
              u0, v0, u1, v1, src_h, src_w, padded_h, padded_w] per image
    src_ref: HBM (N, C, H, W) planar float32 sources
    out_ref: VMEM (1, C, SUPER_H, SUPER_W) warped super-tile
    valid_ref: VMEM (1, SUPER_H, SUPER_W) float32 validity (1.0 valid)
    slabs_ref: VMEM (NCH, C, SLAB_H, SLAB_W) slab scratch (one per chunk)
    tq_ref/lyv_ref: VMEM (NCH, CHUNK_H, CHUNK_W) per-pixel hat arguments
    scal_ref: SMEM (NCH, 8) int32 per-chunk scalars
    slope_ref: SMEM (NCH, 1) float32 per-chunk row-rebase slope

    row_rebase (static): factor the map's tilt out of the horizontal shift
    window. On rotation scenes the chunk-global window qspread (~10-28) is
    dominated by the row-to-row drift of the backward map, not by
    within-row spread: rebasing each slab row's lane origin by the linear
    model u(dr) = round(s*dr) (s = the chunk's d(lx)/d(ly) slope, fitted
    from vertical finite differences) shrinks the per-row window to the
    within-row residual, so a smaller static rung serves the chunk and the
    accumulation loop does proportionally less work. Costs one dynamic
    row roll per (slab row, channel) in phase 2.

    The grid is (N, rows, cols): the batch index is a leading grid dim, so
    warping every image of a stitch (or a whole dispatch batch) is ONE
    kernel launch.
    """
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    scale = misc_ref[b, 0]
    cx = misc_ref[b, 1]
    cy = misc_ref[b, 2]
    kind = misc_ref[b, 3]
    u0b, v0b = misc_ref[b, 4], misc_ref[b, 5]
    u1b, v1b = misc_ref[b, 6], misc_ref[b, 7]
    src_h = misc_ref[b, 8].astype(jnp.int32)
    src_w = misc_ref[b, 9].astype(jnp.int32)
    pad_h = misc_ref[b, 10].astype(jnp.int32)   # DMA-padded source dims
    pad_w = misc_ref[b, 11].astype(jnp.int32)
    C = src_ref.shape[1]

    def chunk_dma(ch, sy0, sx0):
        return pltpu.make_async_copy(
            src_ref.at[b, :, pl.ds(sy0, SLAB_H), pl.ds(sx0, SLAB_W)],
            slabs_ref.at[ch, :, pl.ds(0, SLAB_H), :], sems.at[ch])

    # ---- phase 1: per-chunk map evaluation + slab DMA launch -------------
    for ch in range(NCH):
        sr, sc = divmod(ch, SUB_C)
        ci = ti * SUPER_H + sr * CHUNK_H      # chunk origin in canvas rows
        cj = tj * SUPER_W + sc * CHUNK_W
        for k in range(scal_ref.shape[1]):
            scal_ref[ch, k] = 0
        # validity plane default (dead chunks must not read a stale mask
        # from the previous grid step)
        vmask_ref[ch] = jnp.zeros((CHUNK_H, CHUNK_W), jnp.float32)

        # exact chunk-level ROI test: u depends only on the canvas column,
        # v only on the row, both affinely — corner evaluation suffices
        u_lo = cj.astype(jnp.float32) + cx
        v_lo = ci.astype(jnp.float32) + cy
        chunk_live = ((u_lo + CHUNK_W - 1 >= u0b - 1.0) & (u_lo <= u1b + 1.0)
                      & (v_lo + CHUNK_H - 1 >= v0b - 1.0)
                      & (v_lo <= v1b + 1.0))
        if ablate == "dead":        # experiment: grid/skeleton cost only
            chunk_live = chunk_live & (scale < 0)

        @pl.when(chunk_live)
        def _(ch=ch, ci=ci, cj=cj):
            oy = (ci + jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK_H, CHUNK_W), 0))
            ox = (cj + jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK_H, CHUNK_W), 1))
            u = ox.astype(jnp.float32) + cx
            v = oy.astype(jnp.float32) + cy

            # backward map: surface point -> ray -> K R^-1 projection
            us = u / scale
            vs = v / scale
            # kind: 0 cylindrical, 1 spherical, 2 plane (jit pipeline paths)
            sin_u = jnp.sin(us)
            cos_u = jnp.cos(us)
            sinv = jnp.sin(jnp.pi - vs)
            cosv = jnp.cos(jnp.pi - vs)
            X = jnp.where(kind == 0, sin_u,
                          jnp.where(kind == 1, sinv * sin_u, us))
            Y = jnp.where(kind == 0, vs, jnp.where(kind == 1, cosv, vs))
            Z = jnp.where(kind == 0, cos_u,
                          jnp.where(kind == 1, sinv * cos_u,
                                    jnp.ones_like(us)))
            px = mat_ref[b, 0] * X + mat_ref[b, 1] * Y + mat_ref[b, 2] * Z
            py = mat_ref[b, 3] * X + mat_ref[b, 4] * Y + mat_ref[b, 5] * Z
            pz = mat_ref[b, 6] * X + mat_ref[b, 7] * Y + mat_ref[b, 8] * Z
            ray_ok = pz > 0
            pzs = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
            xs = px / pzs
            ys = py / pzs

            in_roi = ((u >= u0b - 1.0) & (u <= u1b + 1.0)
                      & (v >= v0b - 1.0) & (v <= v1b + 1.0))
            in_img = ((xs >= 0.0) & (xs <= src_w.astype(jnp.float32) - 1.0)
                      & (ys >= 0.0) & (ys <= src_h.astype(jnp.float32) - 1.0))
            ok = ray_ok & in_roi & in_img
            any_ok = jnp.any(ok)
            xs_min = jnp.min(jnp.where(ok, xs, jnp.float32(3.0e38)))
            ys_min = jnp.min(jnp.where(ok, ys, jnp.float32(3.0e38)))
            xs_min = jnp.where(any_ok, xs_min, 0.0)
            ys_min = jnp.where(any_ok, ys_min, 0.0)

            sy0 = jnp.clip(jnp.floor(ys_min).astype(jnp.int32) - 1, 0,
                           jnp.maximum(pad_h - SLAB_H, 0))
            sx0 = jnp.clip(jnp.floor(xs_min).astype(jnp.int32) - 1, 0,
                           jnp.maximum(pad_w - SLAB_W, 0))
            # align DMA origin to the memref tiling (sublane 8, lane 128)
            sy0 = pl.multiple_of((sy0 // 8) * 8, 8)
            sx0 = pl.multiple_of((sx0 // 128) * 128, 128)

            ly = ys - sy0.astype(jnp.float32)   # slab-local float coords
            lx = xs - sx0.astype(jnp.float32)
            # pathologically distorted chunks can exceed the slab; those
            # pixels are conservatively invalidated, like the XLA fallback's
            # out-of-image pixels (weights pinned to zero)
            ok = ok & (lx <= SLAB_W - 2.0) & (ly <= SLAB_H - 2.0)
            # invalid pixels get hat arguments far outside the support so
            # they accumulate exactly zero weight -> reported invalid
            lx = jnp.where(ok, lx, -10.0)
            ly = jnp.where(ok, ly, -10.0)

            rmin = jnp.clip(jnp.floor(jnp.min(jnp.where(ok, ly, 3.0e38))
                                      ).astype(jnp.int32), 0, SLAB_H - 1)
            rmin = jnp.where(any_ok, rmin, 0)
            vmax = jnp.max(jnp.where(ok, ly, -1.0))
            vspread = jnp.ceil(vmax).astype(jnp.int32) - rmin + 1
            vspread = jnp.clip(jnp.where(any_ok, vspread, 0),
                               0, SLAB_H - rmin)

            # lane j of the rolled slab holds slab column qbase + j + k
            jlane = jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK_H, CHUNK_W), 1)
            qrel = jnp.floor(lx).astype(jnp.int32) - jlane
            if row_rebase:
                # fit the chunk's d(lx)/d(ly) slope from vertical finite
                # differences over pixels valid in both rows
                rowm = (jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK_H, CHUNK_W), 0)
                    < CHUNK_H - 1).astype(jnp.float32)
                okf = ok.astype(jnp.float32)
                up = CHUNK_H - 1  # roll by H-1 == roll by -1
                ok2 = okf * pltpu.roll(okf, up, axis=0) * rowm
                dlx = pltpu.roll(lx, up, axis=0) - lx
                dly = pltpu.roll(ly, up, axis=0) - ly
                s_num = jnp.sum(ok2 * dlx)
                s_den = jnp.sum(ok2 * dly)
                s = jnp.where(jnp.abs(s_den) > 1e-3, s_num / s_den, 0.0)
                s = jnp.clip(s, -6.0, 6.0)
                # residual after removing the per-slab-row shift model
                # u(dr) = round(s*dr); the +-(|s|+0.5) slop covers both the
                # rounding of u and the two slab rows (floor(lyv),
                # floor(lyv)+1) a pixel draws taps from
                slop = jnp.abs(s) + 0.5
                lyv_f = ly - rmin.astype(jnp.float32)
                res = qrel.astype(jnp.float32) - s * lyv_f
                qbase = jnp.floor(
                    jnp.min(jnp.where(ok, res, jnp.float32(3.0e38))) - slop
                ).astype(jnp.int32)
                qbase = jnp.where(any_ok, qbase, 0)
                qbase = jnp.clip(qbase, -(SLAB_W - 1), SLAB_W - 1)
                qmaxf = jnp.max(jnp.where(ok, res, jnp.float32(-3.0e38)))
                qspread = jnp.clip(
                    jnp.ceil(qmaxf + slop).astype(jnp.int32) - qbase + 2,
                    0, QSPAN)
                okq = ok & (res + slop - qbase.astype(jnp.float32)
                            <= QSPAN - 2)
                slope_ref[ch, 0] = s
            else:
                qbase = jnp.min(jnp.where(ok, qrel, jnp.int32(2 ** 30)))
                qbase = jnp.where(any_ok, qbase, 0)
                qbase = jnp.clip(qbase, -(SLAB_W - 1), SLAB_W - 1)
                qmax = jnp.max(jnp.where(ok, qrel, -(2 ** 30)))
                qspread = jnp.clip(qmax - qbase + 2, 0, QSPAN)
                # pixels whose shift falls beyond the static QSPAN window
                # when qspread got clipped lose their taps -> invalid
                # (their pinned hat args also accumulate nothing)
                okq = ok & (qrel - qbase <= QSPAN - 2)
                slope_ref[ch, 0] = 0.0
            lx = jnp.where(okq, lx, -10.0)

            scal_ref[ch, _S_ANYOK] = any_ok.astype(jnp.int32)
            scal_ref[ch, _S_ROT] = jnp.mod(-qbase, SLAB_W)
            scal_ref[ch, _S_RMIN] = rmin
            scal_ref[ch, _S_VSPREAD] = vspread
            scal_ref[ch, _S_QSPREAD] = qspread
            scal_ref[ch, _S_SY0] = sy0
            scal_ref[ch, _S_SX0] = sx0
            tq_ref[ch] = lx - (qbase + jlane).astype(jnp.float32)
            lyv_ref[ch] = ly - rmin.astype(jnp.float32)
            # analytic validity: the vertical window always covers both
            # taps by construction (rmin = floor(min ly), vspread from
            # ceil(max ly), ly <= SLAB_H-2), and okq covers the horizontal
            # clip — so the hat weights of valid pixels sum to exactly 1
            # and the kernel skips the weight-sum accumulation + divide
            vmask_ref[ch] = okq.astype(jnp.float32)

            if ablate != "dma":     # experiment: slab-DMA cost
                @pl.when(any_ok)
                def _():
                    chunk_dma(ch, sy0, sx0).start()

    # ---- phase 2: accumulate each chunk (DMAs already in flight) --------
    for ch in range(NCH):
        sr, sc = divmod(ch, SUB_C)
        any_ok = scal_ref[ch, _S_ANYOK] == 1
        rot = scal_ref[ch, _S_ROT]
        rmin = scal_ref[ch, _S_RMIN]
        vspread = scal_ref[ch, _S_VSPREAD]
        qspread = scal_ref[ch, _S_QSPREAD]

        @pl.when(any_ok)
        def _(ch=ch):
            # re-assert DMA-origin alignment (lost via the SMEM round-trip)
            if ablate != "dma":
                chunk_dma(ch,
                          pl.multiple_of(scal_ref[ch, _S_SY0], 8),
                          pl.multiple_of(scal_ref[ch, _S_SX0], 128)).wait()
            # one whole-slab roll per channel (the round-1 kernel rolled
            # every row separately: vspread × C dynamic rolls per chunk)
            if ablate != "roll":    # experiment: dynamic-roll cost
                for c in range(C):
                    slabs_ref[ch, c, pl.ds(0, SLAB_H), :] = pltpu.roll(
                        slabs_ref[ch, c, pl.ds(0, SLAB_H), :], rot,
                        axis=1)

        t = tq_ref[ch][...]
        lyv = lyv_ref[ch][...]

        # Register-carried accumulation, specialized by horizontal span.
        # A one-row-per-iteration loop with per-group pl.when predication
        # and VMEM read-modify-write accumulators spent ~21 ms of a 25 ms
        # rotation-scene warp on loop/branch/RMW overhead (the arithmetic
        # is ~4 ms): here the fori_loop body is straight-line vector code
        # with the accumulators as loop carries (vregs), and the shift-
        # window size is a per-chunk STATIC choice among a few
        # specializations (measured qspread on 1080p rotation scenes:
        # median ~10, p90 ~28), selected by one scalar predicate each.
        # Validity is the phase-1 analytic mask, so no weight-sum channel
        # is accumulated and no normalizing divide runs (hat weights of
        # valid pixels sum to exactly 1 by construction).
        def run_span(nk, rb, ch=ch, rmin=rmin, vspread=vspread,
                     t=t, lyv=lyv):
            # hat(t - k) does not depend on the slab row a tap reads
            # from (lx is row-invariant), so the nk horizontal weight
            # planes are computed ONCE per chunk, outside the row loop
            # — captured by the fori_loop body as loop constants.
            # (Device-time neutral — Mosaic already hoisted the
            # invariant hat; kept because it states the invariance
            # explicitly. See tools/ab_warp_accum.py for the round-5
            # variant study.) Under row_rebase the hat argument shifts
            # per row and must stay inside.
            whs = None if row_rebase else [_hat(t - k) for k in range(nk)]

            def vbody(it, carry):
                accs = list(carry)
                # rows past vspread contribute exactly zero: lyv max is
                # < vspread, so hat(lyv - dr) vanishes for dr >= vspread
                # and the last block may overshoot vspread freely. A row
                # index past the slab end is clamped (this only happens
                # for dr >= vspread, whose weight is already zero — the
                # clamp just keeps the load in bounds).
                for rr in range(rb):
                    dr = it * rb + rr
                    r = jnp.minimum(rmin + dr, SLAB_H - 1)
                    wv = _hat(lyv - dr.astype(jnp.float32))
                    rows = [slabs_ref[ch, c, pl.ds(r, 1), :]
                            for c in range(C)]
                    tk = t
                    if row_rebase:
                        # per-slab-row rebase: shift this row's lane
                        # origin by u = round(s*dr) and the hat argument
                        # to match (see phase-1 window math)
                        u = jnp.floor(
                            slope_ref[ch, 0] * dr.astype(jnp.float32)
                            + 0.5).astype(jnp.int32)
                        rows = [pltpu.roll(rw, jnp.mod(-u, SLAB_W), axis=1)
                                for rw in rows]
                        tk = t - u.astype(jnp.float32)
                    hc = [jnp.zeros((CHUNK_H, CHUNK_W), jnp.float32)
                          for _ in range(C)]
                    for k in range(nk):
                        wh = _hat(tk - k) if row_rebase else whs[k]
                        for c in range(C):
                            # "noshift": scaling probe — drop the per-k
                            # lane shift (garbage output, timing valid)
                            sl = (rows[c][:, 0:CHUNK_W]
                                  if ablate == "noshift"
                                  else rows[c][:, k:k + CHUNK_W])
                            hc[c] = hc[c] + wh * sl
                    for c in range(C):
                        accs[c] = accs[c] + wv * hc[c]
                return tuple(accs)

            zeros = tuple(jnp.zeros((CHUNK_H, CHUNK_W), jnp.float32)
                          for _ in range(C))
            trip = (vspread + rb - 1) // rb
            out = lax.fori_loop(0, trip, vbody, zeros)
            for i in range(C):
                acc_ref[i] = out[i]

        # dead chunks (any_ok false) have vspread 0: every variant's loop
        # runs zero iterations and acc stays zero. Exactly one rung of the
        # ladder fires per chunk; rungs are spaced by 4 shifts around the
        # measured qspread distribution (median ~10, p90 ~28 on 1080p
        # rotation scenes) so the average window overshoot stays small.
        # with row_rebase most chunks collapse to the smallest rung (the
        # residual window is the within-row spread only), so offer a 4-rung
        rungs = ([4] if row_rebase else []) + [8, 12, 16, 20, 24, 32, QSPAN]
        lo = 0
        if ablate == "accum":       # experiment: accumulation-loop cost
            rungs = []
        if ablate in ("k8", "k16"):
            # scaling probe: every live chunk runs a FIXED nk window
            # (wrong output for chunks needing more; timing valid)
            @pl.when(qspread > 0)
            def _():
                run_span(8 if ablate == "k8" else 16, 4)
            rungs = []
        for nk in rungs:
            # "rb2"/"rb8": row-block scaling probes (outputs still exact)
            rb = {"rb2": 2, "rb8": 8}.get(
                ablate, 4 if nk <= 20 else 2)

            @pl.when((qspread > lo) & (qspread <= nk))
            def _(nk=nk, rb=rb):
                run_span(nk, rb)

            lo = nk

        valid = vmask_ref[ch][...] > 0.5
        ys0, ys1 = sr * CHUNK_H, (sr + 1) * CHUNK_H
        xs0, xs1 = sc * CHUNK_W, (sc + 1) * CHUNK_W
        for c in range(C):
            out_ref[0, c, ys0:ys1, xs0:xs1] = jnp.where(
                valid, acc_ref[c], 0.0)
        valid_ref[0, ys0:ys1, xs0:xs1] = vmask_ref[ch][...]


KIND_IDS = {"cylindrical": 0.0, "spherical": 1.0, "plane": 2.0}


def pallas_warp_batched(imgs: jnp.ndarray, k_rinvs: jnp.ndarray, scale,
                        corners: jnp.ndarray, roi_uvs: jnp.ndarray,
                        canvas_hw: tuple[int, int],
                        kind: str = "cylindrical",
                        interpret: bool = False,
                        row_rebase: bool = False,
                        src_sizes=None, ablate: str = ""):
    """Warp (N, H, W, C) imgs into N (Hc, Wc) canvases in ONE kernel launch.

    k_rinvs: (N, 3, 3) K·R⁻¹ backward projections; corners: (N, 2) (x, y)
    canvas origins in pano coords (pass the same shared corner N times to
    warp directly into a shared pano frame); roi_uvs: (N, 4)
    [u0, v0, u1, v1] per-image ROI bounds on the surface.
    Returns (out (N, Hc, Wc, C), valid (N, Hc, Wc)).

    `src_sizes` (optional (N, 2) [h, w]): per-image TRUE sizes when `imgs`
    carries images padded to a common shape (mixed-size stitching). The
    kernel's in-image test is per-image data (misc src_h/src_w), so samples
    beyond an image's true extent are invalidated; pad with edge-replicate
    so border bilinear taps stay exact.

    `kind` is pure data to the kernel (a projector id selected per pixel),
    NOT a compile-time specialization: one executable per shape serves all
    kinds, so switching warp kinds costs no recompile.

    `row_rebase` (static, default off pending TPU measurement): factor the
    map tilt out of the horizontal shift window — see _warp_kernel.

    `ablate` (static, EXPERIMENT-ONLY — output is garbage for any value
    other than ""): compiles the kernel with one phase removed so
    tools/exp_warp_phases.py can attribute kernel time to map-eval /
    DMA / roll / accumulation. Values: "dead" (all chunks skipped),
    "dma", "roll", "accum".
    """
    return _warp_batched_jit(imgs, k_rinvs, scale, corners, roi_uvs,
                             np.float32(KIND_IDS[kind]), canvas_hw,
                             interpret, row_rebase, src_sizes, ablate)


@functools.partial(jax.jit,
                   static_argnames=("canvas_hw", "interpret", "row_rebase",
                                    "ablate"))
def _warp_batched_jit(imgs: jnp.ndarray, k_rinvs: jnp.ndarray, scale,
                      corners: jnp.ndarray, roi_uvs: jnp.ndarray,
                      kind_id, canvas_hw: tuple[int, int],
                      interpret: bool = False, row_rebase: bool = False,
                      src_sizes=None, ablate: str = ""):
    N, H, W = imgs.shape[:3]
    Hc, Wc = canvas_hw
    C = imgs.shape[3] if imgs.ndim == 4 else 1
    planar = (imgs.astype(jnp.float32).reshape(N, H, W, C)
              .transpose(0, 3, 1, 2))                    # (N, C, H, W)
    # pad the source to the DMA tiling and to slab capacity (tiny images)
    Hs = max(-(-H // 8) * 8, SLAB_H)
    Ws = max(-(-W // 128) * 128, SLAB_W)
    if (Hs, Ws) != (H, W):
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, Hs - H), (0, Ws - W)))

    Hp = -(-Hc // SUPER_H) * SUPER_H
    Wp = -(-Wc // SUPER_W) * SUPER_W
    grid = (N, Hp // SUPER_H, Wp // SUPER_W)

    mats = k_rinvs.reshape(N, 9).astype(jnp.float32)
    scales = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1),
                              (N,))[:, None]
    if src_sizes is None:
        true_hw = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (N, 2))
    else:
        true_hw = jnp.asarray(src_sizes, jnp.float32).reshape(N, 2)
    misc = jnp.concatenate([
        scales,
        corners.astype(jnp.float32).reshape(N, 2),
        jnp.broadcast_to(jnp.asarray(kind_id, jnp.float32).reshape(1, 1),
                         (N, 1)),
        roi_uvs.astype(jnp.float32).reshape(N, 4),
        true_hw,
        jnp.broadcast_to(jnp.asarray([Hs, Ws], jnp.float32), (N, 2)),
    ], axis=1)                                            # (N, 12)

    # custom_vmap: pallas_call's generic batching rule mangles the SMEM
    # scalar specs (an OUTER vmap over e.g. pair batches would fail to
    # lower). Since the kernel's own grid already carries a leading batch
    # dimension, an outer vmap FOLDS into it: (B, N, ...) operands reshape
    # to (B*N, ...) and the same kernel runs with grid[0] = B*N — one
    # launch for the whole dispatch batch (VERDICT r2 item 3; the round-2
    # sequential_vmap re-invoked the kernel B times).
    @jax.custom_batching.custom_vmap
    def call(mats, misc, planar):
        n = mats.shape[0]
        return tuple(pl.pallas_call(
            functools.partial(_warp_kernel, row_rebase=row_rebase,
                              ablate=ablate),
            grid=(n,) + grid[1:],
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, C, SUPER_H, SUPER_W),
                             lambda b, i, j: (b, 0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SUPER_H, SUPER_W),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, C, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((n, Hp, Wp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((NCH, C, SLAB_H, SLAB_W), jnp.float32),
                pltpu.VMEM((NCH, CHUNK_H, CHUNK_W), jnp.float32),
                pltpu.VMEM((NCH, CHUNK_H, CHUNK_W), jnp.float32),
                pltpu.VMEM((NCH, CHUNK_H, CHUNK_W), jnp.float32),
                pltpu.VMEM((C, CHUNK_H, CHUNK_W), jnp.float32),
                pltpu.SMEM((NCH, 8), jnp.int32),
                pltpu.SMEM((NCH, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((NCH,)),
            ],
            interpret=interpret,
        )(mats, misc, planar))

    @call.def_vmap
    def _call_vmap(axis_size, in_batched, mats, misc, planar):
        def flat(x, batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((-1,) + x.shape[2:])
        o, v = call(flat(mats, in_batched[0]), flat(misc, in_batched[1]),
                    flat(planar, in_batched[2]))
        return ((o.reshape((axis_size, -1) + o.shape[1:]),
                 v.reshape((axis_size, -1) + v.shape[1:])), (True, True))

    out, valid = call(mats, misc, planar)

    out = out[:, :, :Hc, :Wc].transpose(0, 2, 3, 1)
    if imgs.ndim == 3:
        out = out[..., 0]
    return out, valid[:, :Hc, :Wc] > 0.5


def pallas_warp(img: jnp.ndarray, k_rinv: jnp.ndarray, scale,
                corner: jnp.ndarray, roi_uv: jnp.ndarray,
                canvas_hw: tuple[int, int], kind: str = "cylindrical",
                interpret: bool = False, row_rebase: bool = False):
    """Single-image wrapper over `pallas_warp_batched` (N = 1)."""
    out, valid = pallas_warp_batched(
        img[None], k_rinv[None], scale, corner[None], roi_uv[None],
        canvas_hw, kind, interpret, row_rebase)
    return out[0], valid[0]
