"""Pallas TPU kernel: fused dense detector maps.

The ORB detector needs four dense maps per pyramid level (SURVEY §3.1):
FAST-9/16 corner scores, 3x3 non-max suppression, Harris responses, and
the 7x7 σ=2 Gaussian blur the descriptors sample from. As separate XLA
programs these cost ~4.3 ms/image across a 5-level 1080p pyramid (each map
materializes to HBM and reduce_window lowers conservatively); fused here
they are one pass over the image per level: each grid step loads one
halo-extended row band into VMEM and computes all four maps with static
shifts and register arithmetic (~290 VPU ops/pixel total), writing only
the three result maps.

Semantics match features.fast / ops.image.gaussian_blur on the interior;
the 8-pixel band halo is zero-padded at the image top/bottom and lane
shifts wrap at the padded width, so a few border pixels differ from the
XLA path's roll-wraparound — both are garbage the detector masks anyway
(edge_threshold is 31, ref 特征点检测.cpp:123). Tests compare interiors.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagestitch_tpu.features.fast import CIRCLE16, ARC_LEN

BAND_H = 64        # output rows per grid step
HALO = 8           # halo rows each side (covers FAST r3+NMS1, Harris 4, gauss 3)


def _gauss_taps(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    w = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (w / w.sum()).astype(np.float32)


def _detect_kernel(img_ref, score_ref, harris_ref, blur_ref, slab_ref, sem,
                   *, threshold, block_size, k_harris, taps):
    """One (BAND_H, Wp) band of all three maps for image b.

    img_ref: HBM (B, Hin, Wp) f32, already padded by HALO rows top+bottom.
    Outputs: VMEM (1, BAND_H, Wp) blocks. slab: (BAND_H + 2*HALO, Wp)
    scratch. The grid is (B, bands): a whole image batch is ONE launch.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(i * BAND_H, BAND_H + 2 * HALO), :],
        slab_ref, sem)
    cp.start()
    cp.wait()
    x = slab_ref[...]                               # (BH+16, Wp)

    def sh(a, dy, dx):
        # static shift: value at (r+dy, c+dx)
        if dy:
            a = pltpu.roll(a, (-dy) % a.shape[0], axis=0)
        if dx:
            a = pltpu.roll(a, (-dx) % a.shape[1], axis=1)
        return a

    # ---- FAST-9/16 score (features.fast.fast_score_map semantics) -------
    d = [sh(x, int(dy), int(dx)) - x for dx, dy in CIRCLE16]
    dd = d + d[:ARC_LEN - 1]                        # wrapped, 24 entries
    # hierarchical sliding-window min/max over 9-long arcs: pair/quad/oct
    # partials shared across the 16 windows (4 ops per window amortized
    # instead of 8)
    def windows(vals, op):
        m2 = [op(vals[i], vals[i + 1]) for i in range(23)]
        m4 = [op(m2[i], m2[i + 2]) for i in range(21)]
        m8 = [op(m4[i], m4[i + 4]) for i in range(17)]
        return [op(m8[i], vals[i + 8]) for i in range(16)]

    arc_min = windows(dd, jnp.minimum)
    arc_max = windows(dd, jnp.maximum)
    t = jnp.float32(threshold)
    neg_inf = jnp.float32(-3.4e38)
    score = neg_inf
    for i16 in range(16):
        sb = jnp.where(arc_min[i16] > t, arc_min[i16], neg_inf)
        sd = jnp.where(arc_max[i16] < -t, -arc_max[i16], neg_inf)
        score = jnp.maximum(score, jnp.maximum(sb, sd))
    score = jnp.maximum(score, 0.0)

    # ---- 3x3 NMS (features.fast.nms3x3) ---------------------------------
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(mx, sh(score, dy, dx))
    nms = jnp.where((score >= mx) & (score > 0), score, 0.0)

    # ---- Harris response (features.fast.harris_map) ----------------------
    Ix = sh(x, 0, 1) - sh(x, 0, -1)                 # 0.5*diff*2.0 == diff
    Iy = sh(x, 1, 0) - sh(x, -1, 0)
    r = block_size // 2

    def box(a):
        s = a
        for dy in range(1, r + 1):
            s = s + sh(a, dy, 0) + sh(a, -dy, 0)
        s2 = s
        for dx in range(1, r + 1):
            s2 = s2 + sh(s, 0, dx) + sh(s, 0, -dx)
        return s2

    a_ = box(Ix * Ix)
    b_ = box(Iy * Iy)
    c_ = box(Ix * Iy)
    s4 = jnp.float32((1.0 / (4 * block_size * 255.0)) ** 4)
    harris = (a_ * b_ - c_ * c_ - k_harris * (a_ + b_) * (a_ + b_)) * s4

    # ---- 7x7 separable Gaussian (ops.image.gaussian_blur) ---------------
    rg = len(taps) // 2
    v = jnp.float32(taps[rg]) * x
    for dy in range(1, rg + 1):
        v = v + jnp.float32(taps[rg + dy]) * (sh(x, dy, 0) + sh(x, -dy, 0))
    g = jnp.float32(taps[rg]) * v
    for dx in range(1, rg + 1):
        g = g + jnp.float32(taps[rg + dx]) * (sh(v, 0, dx) + sh(v, 0, -dx))

    score_ref[0] = nms[HALO:HALO + BAND_H, :]
    harris_ref[0] = harris[HALO:HALO + BAND_H, :]
    blur_ref[0] = g[HALO:HALO + BAND_H, :]


@functools.partial(jax.jit, static_argnames=(
    "threshold", "block_size", "k_harris", "ksize", "sigma", "interpret"))
def detect_maps(img: jnp.ndarray, threshold: float, block_size: int = 7,
                k_harris: float = 0.04, ksize: int = 7, sigma: float = 2.0,
                interpret: bool = False):
    """(H, W) f32 image -> (nms_score, harris, blurred), each (H, W) f32,
    in ONE fused pass per row band."""
    H, W = img.shape
    Hp = -(-H // BAND_H) * BAND_H
    Wp = -(-W // 128) * 128
    x = jnp.pad(img.astype(jnp.float32),
                ((HALO, Hp - H + HALO), (0, Wp - W)))
    taps = tuple(float(v) for v in _gauss_taps(ksize, sigma))

    kern = functools.partial(
        _detect_kernel, threshold=float(threshold), block_size=block_size,
        k_harris=float(k_harris), taps=taps)

    # custom_vmap: the generic pallas batching rule would hand the kernel a
    # leading-batch-dim ANY-space operand with a squeezed index map, which
    # the TPU lowering rejects (hit under the chain/Stitcher's vmap over
    # images). The kernel grid carries its own leading batch dim instead,
    # and an outer vmap FOLDS into it (reshape (B1, B2, H, W) -> (B1*B2,
    # H, W)): a whole dispatch batch is ONE kernel launch (VERDICT r2
    # item 3; the round-2 sequential_vmap re-invoked the kernel B times).
    @jax.custom_batching.custom_vmap
    def call(xb):
        B = xb.shape[0]
        return tuple(pl.pallas_call(
            kern,
            grid=(B, Hp // BAND_H),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, BAND_H, Wp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_shape=[jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)] * 3,
            scratch_shapes=[
                pltpu.VMEM((BAND_H + 2 * HALO, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            # XLA's default 16 MB scoped-vmem budget rejects the 1080p
            # level-0 call (it may place the three result buffers in VMEM);
            # v5e has 128 MB of VMEM — raise the cap rather than force HBM
            # streaming
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xb))

    @call.def_vmap
    def _call_vmap(axis_size, in_batched, xb):
        if not in_batched[0]:
            xb = jnp.broadcast_to(xb[None], (axis_size,) + xb.shape)
        flat = xb.reshape((-1,) + xb.shape[2:])
        outs = call(flat)
        return (tuple(o.reshape((axis_size, -1) + o.shape[1:])
                      for o in outs), (True,) * 3)

    nms, harris, blur = (o[0] for o in call(x[None]))
    return nms[:H, :W], harris[:H, :W], blur[:H, :W]
