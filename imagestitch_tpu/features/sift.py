"""SIFT DoG detector + 128-D gradient-histogram descriptor, TPU-native.

The reference implements ORB but its README cites the SIFT literature and
builds OpenCV with NONFREE for it (ref README.md:14-24; SURVEY.md §7 scope
note), and BASELINE.json's north star names SIFT explicitly. This module
provides the float-descriptor detector family behind the same
`ImageFeatures` contract as features.orb:

- Gaussian scale space: per octave, S+3 incremental blurs; octaves are
  2x-downsampled — all static shapes, each level one fused separable conv.
- DoG extrema: |D| above threshold AND strict 26-neighborhood extremum,
  computed as stacked shifted comparisons over the (S+2, H, W) DoG volume
  (no data-dependent loops), plus the Hessian edge-ratio rejection.
- SUBPIXEL refinement: the 3x3x3 quadratic fit of Lowe §4 (offset
  δ = −H⁻¹∇D) run as a fixed-step re-centering loop per keypoint (batched
  27-neighbor gathers + closed-form 3x3 solves — no data-dependent trip
  counts), with the interpolated-contrast re-test |D(δ)| ≥ thresh.
- Orientation: 36-bin Gaussian-weighted gradient histogram per keypoint via
  one-hot matmul binning (MXU), with parabolic peak interpolation and up to
  TWO orientation peaks ≥ 0.8·max (Lowe §5) — the second peak occupies a
  second static keypoint slot, valid only when it exists.
- Per-scale gradients: raw gx/gy stacks over the octave's interior
  levels, gathered per keypoint by its scale index (magnitude/angle are
  computed on the gathered windows — identical values, no full-plane
  sqrt/atan2 passes); the orientation window
  Gaussian and the descriptor sampling grid scale with the keypoint's local
  σ (σ_rel = σ0·2^(l/S)), so higher-scale keypoints see proportionally
  wider windows through the SAME static gather extents.
- Descriptor: 4x4 spatial cells x 8 orientation bins over a rotated,
  σ-scaled 17x17 sample grid — batched gathers + soft-assignment one-hot
  matmuls, then the SIFT normalize -> clip(0.2) -> renormalize. (OpenCV
  samples every pixel of the window; the fixed 289-sample grid subsamples
  large-σ windows — a static-shape approximation, exact at σ = σ0.)

Matching uses the L2 distance matmul (matching.l2_distance_matrix).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import DetectorConfig
from imagestitch_tpu.ops.image import gaussian_blur, resize
from imagestitch_tpu.types import ImageFeatures


def _octave_levels(base, first_octave: bool, S: int, sigma0: float):
    """One octave's S+3 chained Gaussian blur levels (level 0 of octave 0
    carries sigma0)."""
    img = gaussian_blur(base, 7, sigma0) if first_octave else base
    levels = [img]
    for s in range(1, S + 3):
        sig_prev = sigma0 * (2.0 ** ((s - 1) / S))
        sig_cur = sigma0 * (2.0 ** (s / S))
        dsig = float(np.sqrt(max(sig_cur ** 2 - sig_prev ** 2, 1e-6)))
        k = max(3, int(2 * round(3 * dsig) + 1))
        levels.append(gaussian_blur(levels[-1], min(k, 15), dsig))
    return levels


def _octave_shapes(H: int, W: int, num_octaves: int):
    """Static per-octave (H, W) list, replicating _scale_space's stop rule
    (next octave only while min(h, w)//2 >= 16)."""
    shapes = [(H, W)]
    while len(shapes) < num_octaves and min(shapes[-1]) // 2 >= 16:
        shapes.append((shapes[-1][0] // 2, shapes[-1][1] // 2))
    return shapes


def _scale_space(gray, num_octaves: int, S: int, sigma0: float):
    """List of octaves; each octave is a list of S+3 blurred images."""
    octaves = []
    base = gray
    for o in range(num_octaves):
        levels = _octave_levels(base, o == 0, S, sigma0)
        octaves.append(levels)
        # next octave: downsample the level with sigma 2*sigma0
        h, w = levels[S].shape
        if min(h, w) // 2 < 16:
            break
        base = resize(levels[S], (h // 2, w // 2), "linear")
    return octaves


def _octave_maps(base, first_octave: bool, S: int, sigma0: float,
                 contrast_thresh: float, use_pallas: bool):
    """Fused octave maps: (dog (S+2,H,W), interior extrema scores (S,H,W),
    grad gx (S+1,H,W), grad gy, gS). On TPU this is ONE Pallas band
    pass per image (ops.pallas_sift); the XLA composition below is the
    reference implementation and serves CPU/tests.

    Gradients are returned RAW (gx, gy): the orientation/descriptor stages
    consume them only through per-keypoint window gathers, so magnitude/
    angle (sqrt/atan2) are computed there on the small (K, P) windows —
    the same values pointwise, without two full-plane transcendental
    passes per octave."""
    H, W = base.shape
    if use_pallas:
        from imagestitch_tpu.ops.pallas_sift import (octave_halo,
                                                     sift_octave_maps)
        if min(H, W) >= 2 * octave_halo(S, sigma0, first_octave):
            dog, score, gxs, gys, gS = sift_octave_maps(
                base, first_octave, S, sigma0, contrast_thresh)
            # 8-px border mask (the XLA path applies it inside
            # _dog_extrema_scores)
            my = (jnp.arange(H) >= 8) & (jnp.arange(H) < H - 8)
            mx = (jnp.arange(W) >= 8) & (jnp.arange(W) < W - 8)
            score = score * my[None, :, None] * mx[None, None, :]
            return dog, score, gxs, gys, gS
    levels = _octave_levels(base, first_octave, S, sigma0)
    dog = jnp.stack([levels[i + 1] - levels[i]
                     for i in range(len(levels) - 1)])
    score = _dog_extrema_scores(dog, contrast_thresh)
    # per-scale gradient stacks over the octave's interior levels: DoG
    # layer l peaks at blur level l (σ_rel = σ0·2^(l/S))
    gxs, gys = zip(*[_grad(levels[i]) for i in range(1, S + 2)])
    return dog, score[1:S + 1], jnp.stack(gxs), jnp.stack(gys), levels[S]


def _dog_extrema_scores(dog: jnp.ndarray, contrast_thresh: float,
                        edge_ratio: float = 10.0) -> jnp.ndarray:
    """Extremum score volume for a (L, H, W) DoG stack: |D| where the voxel
    is a strict 26-neighborhood extremum passing contrast + edge tests, else
    0. Interior scales only (first/last layer zeroed)."""
    L, H, W = dog.shape
    d = dog

    shifts = []
    for dl in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dl == dy == dx == 0:
                    continue
                shifts.append(jnp.roll(d, (dl, dy, dx), axis=(0, 1, 2)))
    nb = jnp.stack(shifts)                       # (26, L, H, W)
    is_max = jnp.all(d[None] > nb, axis=0)
    is_min = jnp.all(d[None] < nb, axis=0)
    score = jnp.where(is_max | is_min, jnp.abs(d), 0.0)

    # contrast pre-test (OpenCV uses 0.5*thr before interpolation)
    score = jnp.where(jnp.abs(d) >= 0.5 * contrast_thresh, score, 0.0)

    # Hessian edge rejection: tr^2/det < (r+1)^2/r
    dxx = jnp.roll(d, -1, 2) + jnp.roll(d, 1, 2) - 2 * d
    dyy = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
    dxy = 0.25 * (jnp.roll(d, (-1, -1), (1, 2)) + jnp.roll(d, (1, 1), (1, 2))
                  - jnp.roll(d, (-1, 1), (1, 2)) - jnp.roll(d, (1, -1), (1, 2)))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    score = jnp.where(edge_ok, score, 0.0)

    # zero out boundary scales and a pixel border
    score = score.at[0].set(0.0).at[-1].set(0.0)
    mask_y = (jnp.arange(H) >= 8) & (jnp.arange(H) < H - 8)
    mask_x = (jnp.arange(W) >= 8) & (jnp.arange(W) < W - 8)
    return score * mask_y[None, :, None] * mask_x[None, None, :]


def _topk_block_candidates(score_int: jnp.ndarray, quota: int):
    """Top-`quota` extrema candidates from the (S, H, W) score volume via
    block-max coarsening — the ORB selection pattern (features/orb.py
    two-stage selection): a full top_k sort over the flattened megapixel
    volume costs 15.6 ms of the 30.7 ms 1080p detect on TPU; post-NMS DoG
    extrema are sparse (~1 per 3000 px survives), so cap ONE candidate per
    (8, 16) spatial block PER SCALE LAYER and top_k only the block
    winners (~128x smaller sort). Returns (top_s, top_i) with top_i a
    flat index into the (S, H, W) volume; zero-score slots are the
    caller's invalid markers, exactly like plain top_k's."""
    S, H, W = score_int.shape
    BH, BW = 8, 16
    Hp = -(-H // BH) * BH
    Wp = -(-W // BW) * BW
    sp = jnp.pad(score_int, ((0, 0), (0, Hp - H), (0, Wp - W)))
    sb = (sp.reshape(S, Hp // BH, BH, Wp // BW, BW)
          .transpose(0, 1, 3, 2, 4).reshape(S, -1, BH * BW))
    bmax = jnp.max(sb, axis=-1)                      # (S, nB)
    barg = jnp.argmax(sb, axis=-1).astype(jnp.int32)
    nbx = Wp // BW
    bi = jnp.arange(bmax.shape[1], dtype=jnp.int32)[None, :]
    wy = (bi // nbx) * BH + barg // BW               # (S, nB)
    wx = (bi % nbx) * BW + barg % BW
    widx = (jnp.arange(S, dtype=jnp.int32)[:, None] * (H * W)
            + wy * W + wx)
    # pad-region winners carry score 0 (invalid), but clamp their flat
    # index into range so downstream integer math stays in bounds
    widx = jnp.minimum(widx, S * H * W - 1)
    nwin = bmax.size
    kq = min(quota, nwin)
    top_s, top_b = jax.lax.top_k(bmax.reshape(-1), kq)
    top_i = widx.reshape(-1)[top_b]
    if kq < quota:                   # tiny tail octaves: pad invalid slots
        top_s = jnp.concatenate(
            [top_s, jnp.zeros((quota - kq,), top_s.dtype)])
        top_i = jnp.concatenate(
            [top_i, jnp.zeros((quota - kq,), top_i.dtype)])
    return top_s, top_i


def _gather_dog(dog_flat, L, H, W, li, yi, xi):
    li = jnp.clip(li, 0, L - 1)
    yi = jnp.clip(yi, 0, H - 1)
    xi = jnp.clip(xi, 0, W - 1)
    return dog_flat[(li * H + yi) * W + xi]


def _refine_subpixel(dog: jnp.ndarray, li, yk, xk, contrast_thresh: float,
                     n_steps: int = 3):
    """Lowe's 3x3x3 quadratic extremum interpolation (per keypoint).

    δ = −H⁻¹ ∇D from central differences on the 27-neighborhood; a fixed
    number of re-centering steps moves the integer voxel while |δ| > 0.5 in
    some axis (all keypoints take the same static step count — converged
    ones just recompute the same δ). Returns (li', yf, xf, lf_off, ok) with
    subpixel float y/x, the scale offset, and the interpolated-contrast
    validity |D + ½∇D·δ| ≥ contrast_thresh.
    """
    L, H, W = dog.shape
    flat = dog.reshape(-1)

    def deriv(li_, yi_, xi_):
        g = functools.partial(_gather_dog, flat, L, H, W)
        c = g(li_, yi_, xi_)
        dx = 0.5 * (g(li_, yi_, xi_ + 1) - g(li_, yi_, xi_ - 1))
        dy = 0.5 * (g(li_, yi_ + 1, xi_) - g(li_, yi_ - 1, xi_))
        dl = 0.5 * (g(li_ + 1, yi_, xi_) - g(li_ - 1, yi_, xi_))
        dxx = g(li_, yi_, xi_ + 1) + g(li_, yi_, xi_ - 1) - 2 * c
        dyy = g(li_, yi_ + 1, xi_) + g(li_, yi_ - 1, xi_) - 2 * c
        dll = g(li_ + 1, yi_, xi_) + g(li_ - 1, yi_, xi_) - 2 * c
        dxy = 0.25 * (g(li_, yi_ + 1, xi_ + 1) - g(li_, yi_ + 1, xi_ - 1)
                      - g(li_, yi_ - 1, xi_ + 1) + g(li_, yi_ - 1, xi_ - 1))
        dxl = 0.25 * (g(li_ + 1, yi_, xi_ + 1) - g(li_ + 1, yi_, xi_ - 1)
                      - g(li_ - 1, yi_, xi_ + 1) + g(li_ - 1, yi_, xi_ - 1))
        dyl = 0.25 * (g(li_ + 1, yi_ + 1, xi_) - g(li_ + 1, yi_ - 1, xi_)
                      - g(li_ - 1, yi_ + 1, xi_) + g(li_ - 1, yi_ - 1, xi_))
        return c, jnp.stack([dx, dy, dl], -1), dxx, dyy, dll, dxy, dxl, dyl

    def solve_offset(args):
        c, grad, dxx, dyy, dll, dxy, dxl, dyl = args
        # H δ = −g via the adjugate (batched closed-form 3x3 solve)
        a, b, cc = dxx, dxy, dxl
        d_, e, f = dxy, dyy, dyl
        gg, h_, i_ = dxl, dyl, dll
        det = (a * (e * i_ - f * h_) - b * (d_ * i_ - f * gg)
               + cc * (d_ * h_ - e * gg))
        det_safe = jnp.where(jnp.abs(det) < 1e-10, 1e-10, det)
        adj00 = e * i_ - f * h_
        adj01 = cc * h_ - b * i_
        adj02 = b * f - cc * e
        adj10 = f * gg - d_ * i_
        adj11 = a * i_ - cc * gg
        adj12 = cc * d_ - a * f
        adj20 = d_ * h_ - e * gg
        adj21 = b * gg - a * h_
        adj22 = a * e - b * d_
        gx, gy, gl = grad[..., 0], grad[..., 1], grad[..., 2]
        ox = -(adj00 * gx + adj01 * gy + adj02 * gl) / det_safe
        oy = -(adj10 * gx + adj11 * gy + adj12 * gl) / det_safe
        ol = -(adj20 * gx + adj21 * gy + adj22 * gl) / det_safe
        return ox, oy, ol

    li_c, yi_c, xi_c = li, yk, xk
    ox = oy = ol = jnp.zeros(li.shape, jnp.float32)
    for _ in range(n_steps):
        args = deriv(li_c, yi_c, xi_c)
        ox, oy, ol = solve_offset(args)
        # re-center the voxel where an offset exceeds half a pixel
        xi_c = jnp.clip(xi_c + jnp.round(jnp.clip(ox, -1, 1)).astype(
            jnp.int32) * (jnp.abs(ox) > 0.5), 1, W - 2)
        yi_c = jnp.clip(yi_c + jnp.round(jnp.clip(oy, -1, 1)).astype(
            jnp.int32) * (jnp.abs(oy) > 0.5), 1, H - 2)
        li_c = jnp.clip(li_c + jnp.round(jnp.clip(ol, -1, 1)).astype(
            jnp.int32) * (jnp.abs(ol) > 0.5), 1, L - 2)
    args = deriv(li_c, yi_c, xi_c)
    ox, oy, ol = solve_offset(args)
    c, grad = args[0], args[1]
    ox = jnp.clip(ox, -0.5, 0.5)
    oy = jnp.clip(oy, -0.5, 0.5)
    ol = jnp.clip(ol, -0.5, 0.5)
    # interpolated contrast D(δ) = D + ½ ∇D·δ (Lowe eq. 3)
    d_hat = c + 0.5 * (grad[..., 0] * ox + grad[..., 1] * oy
                       + grad[..., 2] * ol)
    ok = jnp.abs(d_hat) >= contrast_thresh
    return (li_c, yi_c.astype(jnp.float32) + oy,
            xi_c.astype(jnp.float32) + ox, ol, ok)


def _grad(img):
    """Raw central-difference gradients (gx, gy) with EDGE-CLAMPED borders
    (a jnp.roll version would wrap the opposite edge into border
    gradients). Magnitude/angle are taken later on gathered windows."""
    p = jnp.pad(img, 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    return gx, gy


@functools.lru_cache(maxsize=None)
def _window_offsets(rad: int):
    # NumPy (not jnp) constants: jnp arrays created while tracing would be
    # cached as leaked tracers across jit scopes
    vs, us = np.mgrid[-rad:rad + 1, -rad:rad + 1]
    return (vs.reshape(-1).astype(np.int32), us.reshape(-1).astype(np.int32))


def _orientations(gx_stack, gy_stack, S, H, W, si, yk, xk, sigma_rel,
                  rad: int = 12, n_peaks: int = 2):
    """Up to `n_peaks` gradient orientations per keypoint (Lowe §5).

    36-bin Gaussian-weighted histogram from the keypoint's OWN scale level,
    window σ = 1.5·σ_rel (per keypoint — the static ±rad gather window is
    shaped by the weights), 6-pass [1 1 1]/3 smoothing like OpenCV, peaks
    ≥ 0.8·max with parabolic bin interpolation.
    Returns (thetas (n_peaks, K), peak_ok (n_peaks, K))."""
    dv_np, du_np = _window_offsets(rad)
    dv = jnp.asarray(dv_np)
    du = jnp.asarray(du_np)
    # axis-aligned windows: per-keypoint dynamic_slice out of an
    # edge-padded stack (edge pad == the old flat gather's clip-to-edge,
    # exactly) — measured 1.6x faster than the flat per-element gather on
    # TPU (tools/exp_gather.py); the descriptor's ROTATED windows keep the
    # flat-gather formulation
    win = 2 * rad + 1
    gxp = jnp.pad(gx_stack.reshape(S, H, W),
                  ((0, 0), (rad, rad), (rad, rad)), mode="edge")
    gyp = jnp.pad(gy_stack.reshape(S, H, W),
                  ((0, 0), (rad, rad), (rad, rad)), mode="edge")

    def one(s, y, x):
        wx = jax.lax.dynamic_slice(gxp, (s, y, x), (1, win, win))
        wy = jax.lax.dynamic_slice(gyp, (s, y, x), (1, win, win))
        return wx.reshape(-1), wy.reshape(-1)

    gx, gy = jax.vmap(one)(si, yk, xk)                           # (K, P)
    m = jnp.sqrt(gx * gx + gy * gy)
    a = jnp.arctan2(gy, gx)
    r2 = (du.astype(jnp.float32) ** 2 + dv.astype(jnp.float32) ** 2)[None, :]
    sig = (1.5 * sigma_rel)[:, None]
    w = jnp.exp(-r2 / (2.0 * sig * sig))
    # hard-window the gather square to the per-keypoint circular radius
    w = jnp.where(r2 <= (3.0 * sig) ** 2, w, 0.0)
    bins = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    onehot = jax.nn.one_hot(bins, 36, dtype=jnp.float32)  # (K, P, 36)
    hist = jnp.einsum("kp,kpb->kb", m * w, onehot)
    for _ in range(6):                       # OpenCV smooths 6 times
        hist = (jnp.roll(hist, 1, 1) + hist + jnp.roll(hist, -1, 1)) / 3.0

    prev = jnp.roll(hist, 1, 1)
    nxt = jnp.roll(hist, -1, 1)
    is_peak = (hist > prev) & (hist > nxt)
    peak_val = jnp.where(is_peak, hist, -jnp.inf)
    top_v, top_b = jax.lax.top_k(peak_val, n_peaks)       # (K, n_peaks)
    hmax = top_v[:, :1]
    ok = (top_v >= 0.8 * hmax) & jnp.isfinite(top_v)

    # parabolic interpolation of the peak bin
    kidx = jnp.arange(hist.shape[0])[:, None]
    hp = prev[kidx, top_b]
    hc = hist[kidx, top_b]
    hn = nxt[kidx, top_b]
    denom = hp - 2.0 * hc + hn
    frac = jnp.where(jnp.abs(denom) > 1e-8,
                     0.5 * (hp - hn) / denom, 0.0)
    bin_f = top_b.astype(jnp.float32) + jnp.clip(frac, -0.5, 0.5) + 0.5
    theta = bin_f / 36.0 * 2 * jnp.pi - jnp.pi
    return theta.T, ok.T                                   # (n_peaks, K)


def _descriptors(gx_flat, gy_flat, S, H, W, si, yk, xk, theta, sigma_rel,
                 cell: int = 4, nbins: int = 8, width: int = 4):
    """SIFT 4x4x8 descriptor per keypoint, (K, 128) float32, normalized.

    The 17x17 sample grid is rotated by θ and scaled by 3σ_rel/4 per
    keypoint (one histogram cell spans 3σ_rel source pixels, Lowe §6), and
    gradients come from the keypoint's own scale level."""
    half = cell * width // 2                              # 8
    vs_np, us_np = _window_offsets(half)
    vs = jnp.asarray(vs_np)
    us = jnp.asarray(us_np)
    ca = jnp.cos(theta)[:, None]
    sa = jnp.sin(theta)[:, None]
    uf = us.astype(jnp.float32)[None, :]
    vf = vs.astype(jnp.float32)[None, :]
    k_scale = (3.0 * sigma_rel / cell)[:, None]           # px per grid step
    ru = jnp.round((uf * ca - vf * sa) * k_scale).astype(jnp.int32)
    rv = jnp.round((uf * sa + vf * ca) * k_scale).astype(jnp.int32)

    yi = jnp.clip(yk[:, None] + rv, 0, H - 1)
    xi = jnp.clip(xk[:, None] + ru, 0, W - 1)
    gx = gx_flat[(si[:, None] * H + yi) * W + xi]         # (K, P)
    gy = gy_flat[(si[:, None] * H + yi) * W + xi]
    m = jnp.sqrt(gx * gx + gy * gy)
    a = jnp.arctan2(gy, gx) - theta[:, None]

    # spatial cell soft-assignment (bilinear over the 4x4 grid)
    gx = (uf + half) / cell - 0.5                         # (1, P) in [-.5,3.5]
    gy = (vf + half) / cell - 0.5
    gx0 = jnp.floor(gx)
    gy0 = jnp.floor(gy)
    fx = gx - gx0
    fy = gy - gy0

    # angular soft assignment
    ab = (a + jnp.pi) / (2 * jnp.pi) * nbins
    ab0 = jnp.floor(ab)
    fa = ab - ab0

    gauss = jnp.exp(-(uf ** 2 + vf ** 2) / (2.0 * (0.5 * cell * width) ** 2))
    base_w = m * gauss                                    # (K, P)

    # The trilinear scatter desc[k, (cy·w+cx)·nb+cb] += w·wy·wx·wa
    # factorizes EXACTLY over (cell, bin): the 128-bin index is
    # cell·nbins+bin and the weight is a product of a spatial part and an
    # angular part, so accumulating the spatial bilinear weights into a
    # dense (K, P, 16) cell map and the angular pair into a (K, P, 8) bin
    # map turns the former 8 x (K, P, 128)-one-hot einsums (the SIFT hot
    # spot: ~600 MB of materialized one-hots per call) into ONE batched
    # (16, P) x (P, 8) MXU contraction per keypoint.
    ncell = width * width
    K = yk.shape[0]
    # spatial weights depend only on the (un-rotated) sample grid -> (1, P,
    # 16), built once and broadcast against the per-keypoint magnitudes
    P = us.shape[0]
    wcell = jnp.zeros((1, P, ncell), jnp.float32)
    for dy_ in (0, 1):
        wy = jnp.where(dy_ == 0, 1.0 - fy, fy)
        cy = jnp.clip(gy0 + dy_, 0, width - 1).astype(jnp.int32)
        for dx_ in (0, 1):
            wx = jnp.where(dx_ == 0, 1.0 - fx, fx)
            cx = jnp.clip(gx0 + dx_, 0, width - 1).astype(jnp.int32)
            oh = jax.nn.one_hot(cy * width + cx, ncell, dtype=jnp.float32)
            wcell = wcell + (wy * wx)[..., None] * oh     # (1, P, 16)
    wbin = jnp.zeros((K, P, nbins), jnp.float32)
    for da_ in (0, 1):
        wa = jnp.where(da_ == 0, 1.0 - fa, fa)
        cb = (ab0.astype(jnp.int32) + da_) % nbins
        wbin = wbin + wa[..., None] * jax.nn.one_hot(cb, nbins,
                                                     dtype=jnp.float32)
    desc = jnp.einsum("kpc,kpb->kcb", wcell * base_w[..., None], wbin)
    desc = desc.reshape(K, ncell * nbins)

    # normalize -> clip 0.2 -> renormalize (SIFT illumination invariance)
    n = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc / jnp.maximum(n, 1e-8)
    desc = jnp.minimum(desc, 0.2)
    n = jnp.linalg.norm(desc, axis=1, keepdims=True)
    return desc / jnp.maximum(n, 1e-8)


def detect_and_compute_sift(gray: jnp.ndarray,
                            cfg: DetectorConfig = DetectorConfig(),
                            num_octaves: int = 4, scales_per_octave: int = 3,
                            sigma0: float = 1.6,
                            contrast_thresh: float = 0.04) -> ImageFeatures:
    """SIFT detect+describe -> padded ImageFeatures with (K, 128) float32
    descriptors (descriptor width differs from ORB's 256 bits; the matcher
    dispatches on dtype). Each DoG extremum may emit up to two keypoints
    (second orientation peak), like Lowe's detector.

    `contrast_thresh` uses OpenCV's contrastThreshold semantics (default
    0.04 on 0..1 intensities): the interpolated-extremum rejection is
    |D̂| · nOctaveLayers < contrastThreshold, converted here to the 0..255
    DoG units this pipeline uses (sift.cpp calcContrastThreshold /
    adjustLocalExtrema; pre-test at half the converted value)."""
    H, W = gray.shape
    gray = gray.astype(jnp.float32)
    S = scales_per_octave
    # OpenCV: |D̂| * S < thresh on 0..1 images  <=>  |D̂| < thresh*255/S here
    contrast_thresh = contrast_thresh * 255.0 / S
    shapes = _octave_shapes(H, W, num_octaves)
    use_pallas = jax.default_backend() == "tpu"

    # each extremum can spawn 2 oriented keypoints
    quota = max(cfg.max_keypoints // (2 * len(shapes)), 16)
    xs, ys, resp, angs, sizes, levels, valids, descs = \
        [], [], [], [], [], [], [], []

    base = gray
    for o, (Hh, Wh) in enumerate(shapes):
        dog, score_int, gx_stack, gy_stack, gS = _octave_maps(
            base, o == 0, S, sigma0, contrast_thresh, use_pallas)
        if o + 1 < len(shapes):
            base = resize(gS, shapes[o + 1], "linear")
        top_s, top_i = _topk_block_candidates(score_int, quota)
        v = top_s > 0
        li = top_i // (Hh * Wh) + 1      # interior layer -> DoG layer index
        rem = top_i % (Hh * Wh)
        yk = rem // Wh
        xk = rem % Wh

        # subpixel 3x3x3 quadratic refinement + interpolated contrast test
        li_r, yf, xf, ol, c_ok = _refine_subpixel(
            dog, li, yk, xk, contrast_thresh)
        v = v & c_ok
        yk_i = jnp.clip(jnp.round(yf).astype(jnp.int32), 0, Hh - 1)
        xk_i = jnp.clip(jnp.round(xf).astype(jnp.int32), 0, Wh - 1)

        gx_flat = gx_stack.reshape(-1)
        gy_flat = gy_stack.reshape(-1)
        si = jnp.clip(li_r - 1, 0, S)                    # stack index
        lf = li_r.astype(jnp.float32) + ol               # interpolated scale
        sigma_rel = sigma0 * (2.0 ** (jnp.clip(lf, 0.0, S + 1.0) / S))

        thetas, peak_ok = _orientations(
            gx_stack, gy_stack, S + 1, Hh, Wh, si, yk_i, xk_i, sigma_rel)

        s = float(2 ** o)
        # ONE descriptor call for all orientation peaks (row p*quota+k is
        # peak p of keypoint k): same per-row math, but the gathers and
        # soft-assign contractions run at 2x batch instead of as two small
        # calls per octave
        npk = thetas.shape[0]
        d_all = _descriptors(gx_flat, gy_flat, S + 1, Hh, Wh,
                             jnp.tile(si, npk), jnp.tile(yk_i, npk),
                             jnp.tile(xk_i, npk), thetas.reshape(-1),
                             jnp.tile(sigma_rel, npk))
        for p in range(npk):
            theta = thetas[p]
            vp = v & peak_ok[p]
            d = d_all[p * quota:(p + 1) * quota]
            xs.append(xf * s)
            ys.append(yf * s)
            resp.append(jnp.where(vp, top_s, 0.0))
            angs.append(theta)
            sizes.append(sigma_rel * s * 2.0)
            levels.append(jnp.full((quota,), o, jnp.int32))
            valids.append(vp)
            descs.append(d)

    xy = jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], axis=1)
    feats = ImageFeatures(
        xy=xy,
        response=jnp.concatenate(resp),
        angle=jnp.concatenate(angs),
        size=jnp.concatenate(sizes),
        level=jnp.concatenate(levels),
        valid=jnp.concatenate(valids),
        descriptors=jnp.concatenate(descs, axis=0),
        img_size=jnp.asarray([H, W], jnp.int32),
    )
    from imagestitch_tpu.features.orb import _pad_or_trim
    return _pad_or_trim(feats, cfg.max_keypoints)
