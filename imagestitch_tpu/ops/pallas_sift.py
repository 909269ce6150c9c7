"""Pallas TPU kernel: fused SIFT octave maps (DoG pyramid + extrema scores).

One octave of the SIFT detector (features.sift) needs, per image:
S+3 chained Gaussian blurs, S+2 DoG layers, the 26-neighborhood extremum
score volume with contrast + Hessian-edge tests, per-level gradient
magnitude/angle stacks, and the sigma-2 level that seeds the next octave.
As separate XLA ops the extremum test alone materializes 26 rolled copies
of the (S+2, H, W) DoG volume to HBM (~1 GB of traffic at 1080p), and every
blur/DoG/gradient is its own HBM round trip.

Fused here: each grid step DMAs one halo-extended row band of the octave
base into VMEM and computes the ENTIRE octave stack with static shifts and
register arithmetic, writing only the five result volumes (gS, DoG, interior
extrema scores, gradient mags, gradient angles). The halo covers the
cumulative radius of the chained blurs (~32 rows), so every output row is
exact; the wrapper reflect-pads the image so borders match the XLA path's
BORDER_REFLECT_101 blur semantics (ops.image._sep_filter2d). The only
intended deviation: gradients at the outermost image pixel use the reflect
halo instead of features.sift._grad's edge clamp (a 1-px border the 8-px
score mask already excludes from keypoint centers).

Semantics mirror features.sift._scale_space / _dog_extrema_scores (which
remain the reference implementation and the CPU/test path); the reference's
detector family is ORB but its README builds NONFREE for the SIFT
literature this follows (ref README.md:14-24, SURVEY.md §7 scope note).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND_H = 64        # output rows per grid step


def _np_taps(ksize: int, sigma: float) -> tuple[float, ...]:
    """1-D Gaussian taps, matching ops.image.gaussian_kernel1d."""
    r = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - r
    w = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return tuple(float(v) for v in (w / w.sum()).astype(np.float32))


@functools.lru_cache(maxsize=None)
def octave_taps(S: int, sigma0: float, first_octave: bool):
    """(pre_taps | None, chain_taps): the same kernel sizes/sigmas as
    features.sift._scale_space (k = max(3, 2*round(3*dsig)+1) clipped to 15;
    octave 0 pre-blurs the base with (7, sigma0))."""
    pre = _np_taps(7, sigma0) if first_octave else None
    chain = []
    for s in range(1, S + 3):
        sig_prev = sigma0 * (2.0 ** ((s - 1) / S))
        sig_cur = sigma0 * (2.0 ** (s / S))
        dsig = float(np.sqrt(max(sig_cur ** 2 - sig_prev ** 2, 1e-6)))
        k = max(3, int(2 * round(3 * dsig) + 1))
        chain.append(_np_taps(min(k, 15), dsig))
    return pre, tuple(chain)


def octave_halo(S: int, sigma0: float, first_octave: bool) -> int:
    """Halo rows/cols: cumulative blur radius + 2 (extrema/Hessian/grad
    shifts), rounded up to a sublane multiple."""
    pre, chain = octave_taps(S, sigma0, first_octave)
    cum = (len(pre) // 2 if pre else 0) + sum(len(t) // 2 for t in chain)
    return -(-(cum + 2) // 8) * 8


def _sift_kernel(img_ref, gs_ref, dog_ref, score_ref, gx_ref, gy_ref,
                 slab_ref, sem, *, pre_taps, chain_taps, S, halo,
                 contrast_thresh, edge_ratio):
    """One (BAND_H, Wp) band of every octave map for image b.

    img_ref: HBM (B, Hin, Wp) f32, reflect/zero padded by `halo` rows.
    Outputs (VMEM blocks): gs (1, BH, Wp), dog (1, S+2, BH, Wp),
    score (1, S, BH, Wp) — interior DoG layers 1..S only, gx/gy
    (1, S+1, BH, Wp) — raw central-difference gradients of blur levels
    1..S+1 (magnitude/angle are computed by the wrapper in XLA: atan2 has
    no Pallas TPU lowering, and sqrt/atan2 outside the kernel keeps the
    values bit-identical to the features.sift reference path anyway).
    Grid (B, bands).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = BAND_H + 2 * halo
    cp = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(i * BAND_H, rows), :], slab_ref, sem)
    cp.start()
    cp.wait()
    x = slab_ref[...]                                   # (rows, Wp)

    def sh(a, dy, dx):
        # static shift: value at (r+dy, c+dx); wraps at the padded extents
        if dy:
            a = pltpu.roll(a, (-dy) % a.shape[0], axis=0)
        if dx:
            a = pltpu.roll(a, (-dx) % a.shape[1], axis=1)
        return a

    def blur(a, taps):
        r = len(taps) // 2
        v = jnp.float32(taps[r]) * a
        for d in range(1, r + 1):
            v = v + jnp.float32(taps[r + d]) * (sh(a, d, 0) + sh(a, -d, 0))
        g = jnp.float32(taps[r]) * v
        for d in range(1, r + 1):
            g = g + jnp.float32(taps[r + d]) * (sh(v, 0, d) + sh(v, 0, -d))
        return g

    # ---- Gaussian scale space: S+3 chained separable blurs ---------------
    g = blur(x, pre_taps) if pre_taps is not None else x
    levels = [g]
    for taps in chain_taps:
        g = blur(g, taps)
        levels.append(g)

    dogs = [levels[l + 1] - levels[l] for l in range(len(levels) - 1)]

    # ---- 26-neighborhood extrema scores (interior layers 1..S) -----------
    # matches features.sift._dog_extrema_scores: |D| where strict 3x3x3
    # extremum AND |D| >= 0.5*thresh AND Hessian edge-ratio test
    ct = jnp.float32(0.5 * contrast_thresh)
    r_ = jnp.float32(edge_ratio)
    for li, l in enumerate(range(1, S + 1)):
        d = dogs[l]
        is_max = None
        is_min = None
        for dl in (-1, 0, 1):
            src = dogs[l + dl]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dl == dy == dx == 0:
                        continue
                    nb = sh(src, dy, dx)
                    gt = d > nb
                    lt = d < nb
                    is_max = gt if is_max is None else (is_max & gt)
                    is_min = lt if is_min is None else (is_min & lt)
        score = jnp.where(is_max | is_min, jnp.abs(d), 0.0)
        score = jnp.where(jnp.abs(d) >= ct, score, 0.0)

        dxx = sh(d, 0, 1) + sh(d, 0, -1) - 2.0 * d
        dyy = sh(d, 1, 0) + sh(d, -1, 0) - 2.0 * d
        dxy = 0.25 * (sh(d, 1, 1) + sh(d, -1, -1)
                      - sh(d, 1, -1) - sh(d, -1, 1))
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        edge_ok = (det > 0.0) & (tr * tr * r_ < (r_ + 1.0) ** 2 * det)
        score = jnp.where(edge_ok, score, 0.0)
        score_ref[0, li] = score[halo:halo + BAND_H, :]

    # ---- per-level gradients (blur levels 1..S+1) -------------------------
    for gi, l in enumerate(range(1, S + 2)):
        a = levels[l]
        gx = 0.5 * (sh(a, 0, 1) - sh(a, 0, -1))
        gy = 0.5 * (sh(a, 1, 0) - sh(a, -1, 0))
        gx_ref[0, gi] = gx[halo:halo + BAND_H, :]
        gy_ref[0, gi] = gy[halo:halo + BAND_H, :]

    for l in range(S + 2):
        dog_ref[0, l] = dogs[l][halo:halo + BAND_H, :]
    gs_ref[0] = levels[S][halo:halo + BAND_H, :]


@functools.partial(jax.jit, static_argnames=(
    "first_octave", "S", "sigma0", "contrast_thresh", "edge_ratio",
    "interpret"))
def sift_octave_maps(base: jnp.ndarray, first_octave: bool, S: int = 3,
                     sigma0: float = 1.6, contrast_thresh: float = 34.0,
                     edge_ratio: float = 10.0, interpret: bool = False):
    """(H, W) f32 octave base -> fused octave maps, ONE pass per row band:

      dog   (S+2, H, W)   DoG volume (for subpixel refinement)
      score (S, H, W)     extrema scores for INTERIOR DoG layers 1..S
      gx    (S+1, H, W)   raw d/dx central differences of blur levels 1..S+1
      gy    (S+1, H, W)   raw d/dy of the same levels
      gS    (H, W)        blur level S (the next octave's 2x-downsample src)

    Callers gate on min(H, W) >= 2*halo (small tail octaves run the XLA
    reference path; they cost nothing anyway).
    """
    H, W = base.shape
    halo = octave_halo(S, sigma0, first_octave)
    pre, chain = octave_taps(S, sigma0, first_octave)

    Hp = -(-H // BAND_H) * BAND_H
    Wp = -(-(W + 2 * halo) // 128) * 128
    # reflect pad (the XLA blur's BORDER_REFLECT_101), then zero-fill to the
    # grid/lane-aligned extents; valid output cols start at `halo`
    x = jnp.pad(base.astype(jnp.float32), ((halo, halo), (halo, halo)),
                mode="reflect")
    x = jnp.pad(x, ((0, Hp - H), (0, Wp - W - 2 * halo)))

    kern = functools.partial(
        _sift_kernel, pre_taps=pre, chain_taps=chain, S=S, halo=halo,
        contrast_thresh=float(contrast_thresh), edge_ratio=float(edge_ratio))

    ndog = S + 2

    # custom_vmap: fold an outer vmap batch into the kernel's leading grid
    # dim (same pattern/rationale as ops.pallas_detect.detect_maps)
    @jax.custom_batching.custom_vmap
    def call(xb):
        B = xb.shape[0]
        return tuple(pl.pallas_call(
            kern,
            grid=(B, Hp // BAND_H),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, BAND_H, Wp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ndog, BAND_H, Wp), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, BAND_H, Wp), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S + 1, BAND_H, Wp), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S + 1, BAND_H, Wp), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((B, ndog, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((B, S, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((B, S + 1, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((B, S + 1, Hp, Wp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((BAND_H + 2 * halo, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
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
                      for o in outs), (True,) * 5)

    gs, dog, score, gx, gy = (o[0] for o in call(x[None]))
    sl = lambda a: a[..., :H, halo:halo + W]
    # raw gx/gy, NOT magnitude/angle: the downstream orientation and
    # descriptor stages consume gradients only through per-keypoint window
    # gathers, so sqrt/atan2 run there on (K, P) windows — pointwise the
    # same values, without materializing (or transcendental-evaluating)
    # two full (S+1, H, W) planes per octave
    return sl(dog), sl(score), sl(gx), sl(gy), sl(gs)
