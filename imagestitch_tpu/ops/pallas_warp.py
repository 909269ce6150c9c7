"""Pallas TPU kernel: gather-free tiled bilinear warp.

The warp stage is the pipeline's hot op (SURVEY.md §3.4: buildMaps + remap).
XLA lowers `remap` to a scalarized HBM gather (~4 ns/index → ~65 ms for a
1080p cylindrical warp on v5e). This kernel exploits the SMOOTHNESS of
rotation-warp backward maps: each (8, 128) output tile maps to a compact
source slab, so per tile we

  1. evaluate the backward map analytically on the tile's coordinates
     (VPU trig; matrices arrive in SMEM),
  2. DMA one (SLAB_H, SLAB_W) source slab from HBM at a dynamically
     computed origin (the map is smooth ⇒ the slab covers the whole tile),
  3. resolve bilinear sampling as dense hat-weighted sums over a small
     vertical window (VSPAN rows at dynamic offsets — dynamic sublane
     slices) and static lane shifts (QSPAN) — pure vector ALU work, ZERO
     gathers.

Out-of-slab pixels (pathologically distorted tiles) and out-of-image pixels
fall out with zero accumulated weight and are reported invalid, matching the
XLA fallback's mask semantics. The same kernel runs under interpret mode on
CPU for tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output tile and source slab geometry
TILE_H = 8
TILE_W = 128
SLAB_H = 32        # vertical slab capacity (source rows per tile)
SLAB_W = 384       # horizontal slab capacity (source cols per tile)
VSPAN = 16         # vertical hat window (rows actually summed)
QSPAN = 48         # horizontal shift window (static lane shifts summed)
KGROUP = 8         # k-shift group size for runtime predication
# HBM DMA slice origins must be aligned to the (8, 128) tile grid (Mosaic
# constraint); slabs are over-sized so quantizing the origin down still
# covers the tile's source extent


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _warp_kernel(mat_ref, misc_ref, src_ref, out_ref, valid_ref,
                 slab_ref, acc_ref, grp_ref, sem):
    """One (TILE_H, TILE_W) output tile of image b.

    mat_ref: SMEM (N, 9) float32 — k_rinv (row-major) per image
    misc_ref: SMEM (N, 12) float32 — [scale, corner_x, corner_y, kind,
              u0, v0, u1, v1, src_h, src_w, padded_h, padded_w] per image
    src_ref: HBM (N, C, H, W) planar float32 sources
    out_ref: VMEM (1, C, TILE_H, TILE_W) warped tile
    valid_ref: VMEM (1, TILE_H, TILE_W) float32 validity (1.0 valid)
    slab_ref: VMEM (C, SLAB_H, SLAB_W) scratch

    The grid is (N, rows, cols): the batch index is a leading grid dim, so
    warping every image of a stitch (or a whole dispatch batch) is ONE
    kernel launch. Tiles whose ROI test rejects every pixel (the common case
    when warping directly into a wide shared pano canvas) skip their slab
    DMA and the accumulation loops entirely — they only pay the map trig.
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

    # pano coords of this tile
    oy = (ti * TILE_H
          + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
    ox = (tj * TILE_W
          + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1))
    u = ox.astype(jnp.float32) + cx
    v = oy.astype(jnp.float32) + cy

    # backward map: surface point -> ray -> K R^-1 projection
    us = u / scale
    vs = v / scale
    # kind: 0 cylindrical, 1 spherical, 2 plane (the pipeline's jit paths)
    sin_u = jnp.sin(us)
    cos_u = jnp.cos(us)
    sinv = jnp.sin(jnp.pi - vs)
    cosv = jnp.cos(jnp.pi - vs)
    X = jnp.where(kind == 0, sin_u,
                  jnp.where(kind == 1, sinv * sin_u, us))
    Y = jnp.where(kind == 0, vs, jnp.where(kind == 1, cosv, vs))
    Z = jnp.where(kind == 0, cos_u,
                  jnp.where(kind == 1, sinv * cos_u, jnp.ones_like(us)))
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
    # coordinates for invalid pixels are pinned inside the slab so they
    # can't blow up the slab origin computation
    xs = jnp.where(ok, xs, jnp.float32(0.0))
    ys = jnp.where(ok, ys, jnp.float32(0.0))
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

    # slab DMA (all channels in one copy: planar source), skipped when the
    # tile has no valid pixels (out-of-ROI tiles of the shared pano canvas)
    dma = pltpu.make_async_copy(
        src_ref.at[b, :, pl.ds(sy0, SLAB_H), pl.ds(sx0, SLAB_W)],
        slab_ref, sem)

    @pl.when(any_ok)
    def _():
        dma.start()

    ly = ys - sy0.astype(jnp.float32)           # slab-local float coords
    lx = xs - sx0.astype(jnp.float32)
    # pathologically distorted tiles can exceed the slab; those pixels are
    # conservatively invalidated (weights forced to zero)
    fits = (lx <= SLAB_W - 2.0) & (ly <= SLAB_H - 2.0)
    ok = ok & fits
    lx = jnp.where(fits, lx, -10.0)
    ly = jnp.where(fits, ly, -10.0)

    # vertical window base (per tile)
    rmin = jnp.clip(jnp.floor(jnp.min(jnp.where(ok, ly, 3.0e38))
                              ).astype(jnp.int32),
                    0, SLAB_H - VSPAN)
    rmin = jnp.where(any_ok, rmin, 0)
    # horizontal: lane j of the rolled row holds slab column qbase + j + k
    jlane = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    qrel = jnp.floor(lx).astype(jnp.int32) - jlane
    qbase = jnp.min(jnp.where(ok, qrel, jnp.int32(2 ** 30)))
    qbase = jnp.where(any_ok, qbase, 0)
    qbase = jnp.clip(qbase, -(SLAB_W - 1), SLAB_W - 1)

    # per-tile ACTUAL spans: most tiles of a realistic warp need only a few
    # vertical rows and horizontal shifts (large-focal cylindrical maps are
    # near-identity) — the window loops below are predicated per group so
    # the unneeded bulk of VSPAN x QSPAN is skipped at runtime
    vmax = jnp.max(jnp.where(ok, ly, -1.0))
    vspread = jnp.ceil(vmax).astype(jnp.int32) - rmin + 1   # rows needed
    vspread = jnp.where(any_ok, vspread, 0)
    qmax = jnp.max(jnp.where(ok, qrel, -(2 ** 30)))
    qspread = qmax - qbase + 2                               # shifts needed

    @pl.when(any_ok)
    def _():
        dma.wait()

    # NOTE(perf): hat-sum formulation; a butterfly (binary-shift select)
    # gather would cut the per-pixel work to ~10 log-steps; follow-up.
    rot = jnp.mod(-qbase, SLAB_W)  # Mosaic dynamic rotate needs nonneg shift
    t = lx - (qbase + jlane).astype(jnp.float32)          # hoisted h-arg

    acc_ref[...] = jnp.zeros_like(acc_ref)
    grp_ref[...] = jnp.zeros_like(grp_ref)
    for dr in range(VSPAN):
        @pl.when(dr < vspread)
        def _(dr=dr):
            r = rmin + dr
            wv = _hat(ly - r.astype(jnp.float32))         # (TH, TW)
            rows = [pltpu.roll(slab_ref[c, pl.ds(r, 1), :], rot, axis=1)
                    for c in range(C)]                    # (1, SLAB_W)
            for kg in range(0, QSPAN, KGROUP):
                @pl.when(kg < qspread)
                def _(kg=kg, rows=rows):
                    ha = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                    hc = [jnp.zeros((TILE_H, TILE_W), jnp.float32)
                          for _ in range(C)]
                    for k in range(kg, kg + KGROUP):
                        wh = _hat(t - k)
                        ha = ha + wh
                        for c in range(C):
                            hc[c] = hc[c] + wh * rows[c][:, k:k + TILE_W]
                    grp_ref[0] = grp_ref[0] + ha
                    for c in range(C):
                        grp_ref[1 + c] = grp_ref[1 + c] + hc[c]
            acc_ref[0] = acc_ref[0] + wv * grp_ref[0]
            for c in range(C):
                acc_ref[1 + c] = acc_ref[1 + c] + wv * grp_ref[1 + c]
            grp_ref[...] = jnp.zeros_like(grp_ref)

    wsum = acc_ref[0]
    wsafe = jnp.where(wsum > 1e-6, wsum, 1.0)
    # interior pixels accumulate exactly 1.0 total weight; anything less
    # means a tap fell outside the window -> conservatively invalid
    valid = ok & (wsum > 0.99)
    for c in range(C):
        out_ref[0, c] = jnp.where(valid, acc_ref[1 + c] / wsafe, 0.0)
    valid_ref[0] = valid.astype(jnp.float32)


KIND_IDS = {"cylindrical": 0.0, "spherical": 1.0, "plane": 2.0}


@functools.partial(jax.jit,
                   static_argnames=("canvas_hw", "kind", "interpret"))
def pallas_warp_batched(imgs: jnp.ndarray, k_rinvs: jnp.ndarray, scale,
                        corners: jnp.ndarray, roi_uvs: jnp.ndarray,
                        canvas_hw: tuple[int, int],
                        kind: str = "cylindrical",
                        interpret: bool = False):
    """Warp (N, H, W, C) imgs into N (Hc, Wc) canvases in ONE kernel launch.

    k_rinvs: (N, 3, 3) K·R⁻¹ backward projections; corners: (N, 2) (x, y)
    canvas origins in pano coords (pass the same shared corner N times to
    warp directly into a shared pano frame); roi_uvs: (N, 4)
    [u0, v0, u1, v1] per-image ROI bounds on the surface.
    Returns (out (N, Hc, Wc, C), valid (N, Hc, Wc)).
    """
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

    Hp = -(-Hc // TILE_H) * TILE_H
    Wp = -(-Wc // TILE_W) * TILE_W
    grid = (N, Hp // TILE_H, Wp // TILE_W)

    mats = k_rinvs.reshape(N, 9).astype(jnp.float32)
    scales = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1),
                              (N,))[:, None]
    misc = jnp.concatenate([
        scales,
        corners.astype(jnp.float32).reshape(N, 2),
        jnp.full((N, 1), KIND_IDS[kind], jnp.float32),
        roi_uvs.astype(jnp.float32).reshape(N, 4),
        jnp.broadcast_to(jnp.asarray([H, W, Hs, Ws], jnp.float32), (N, 4)),
    ], axis=1)                                            # (N, 12)

    # sequential_vmap: pallas_call's generic batching rule mangles the SMEM
    # scalar specs (an OUTER vmap over e.g. pair batches would fail to
    # lower); mapping outer batch members sequentially re-invokes the same
    # compiled kernel. The N images WITHIN one call batch via the grid.
    @jax.custom_batching.sequential_vmap
    def call(mats, misc, planar):
        return pl.pallas_call(
            _warp_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, C, TILE_H, TILE_W),
                             lambda b, i, j: (b, 0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_H, TILE_W), lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, C, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((N, Hp, Wp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((C, SLAB_H, SLAB_W), jnp.float32),
                pltpu.VMEM((C + 1, TILE_H, TILE_W), jnp.float32),
                pltpu.VMEM((C + 1, TILE_H, TILE_W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(mats, misc, planar)

    out, valid = call(mats, misc, planar)

    out = out[:, :, :Hc, :Wc].transpose(0, 2, 3, 1)
    if imgs.ndim == 3:
        out = out[..., 0]
    return out, valid[:, :Hc, :Wc] > 0.5


def pallas_warp(img: jnp.ndarray, k_rinv: jnp.ndarray, scale,
                corner: jnp.ndarray, roi_uv: jnp.ndarray,
                canvas_hw: tuple[int, int], kind: str = "cylindrical",
                interpret: bool = False):
    """Single-image wrapper over `pallas_warp_batched` (N = 1)."""
    out, valid = pallas_warp_batched(
        img[None], k_rinv[None], scale, corner[None], roi_uv[None],
        canvas_hw, kind, interpret)
    return out[0], valid[0]
