"""SIFT-style DoG detector + 128-D gradient-histogram descriptor, TPU-native.

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
- Per-octave static top-k quotas (capacity + validity masks, same design as
  the ORB path).
- Orientation: 36-bin Gaussian-weighted gradient histogram per keypoint via
  one-hot matmul binning (MXU), dominant peak.
- Descriptor: 4x4 spatial cells x 8 orientation bins over a rotated 16x16
  sample grid — batched gathers + soft-assignment one-hot matmuls, then the
  SIFT normalize -> clip(0.2) -> renormalize.

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


def _scale_space(gray, num_octaves: int, S: int, sigma0: float):
    """List of octaves; each octave is a list of S+3 blurred images."""
    octaves = []
    base = gray
    for o in range(num_octaves):
        levels = []
        img = base
        prev_sigma = sigma0 if o == 0 else sigma0  # base re-blurred below
        # level 0 of the octave carries sigma0
        if o == 0:
            img = gaussian_blur(img, 7, sigma0)
        levels.append(img)
        for s in range(1, S + 3):
            sig_prev = sigma0 * (2.0 ** ((s - 1) / S))
            sig_cur = sigma0 * (2.0 ** (s / S))
            dsig = float(np.sqrt(max(sig_cur ** 2 - sig_prev ** 2, 1e-6)))
            k = max(3, int(2 * round(3 * dsig) + 1))
            img = gaussian_blur(img, min(k, 15), dsig)
            levels.append(img)
        octaves.append(levels)
        # next octave: downsample the level with sigma 2*sigma0
        h, w = levels[S].shape
        if min(h, w) // 2 < 16:
            break
        base = resize(levels[S], (h // 2, w // 2), "linear")
    return octaves


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

    # contrast threshold (OpenCV uses 0.5*thr for the pre-interp test)
    score = jnp.where(jnp.abs(d) >= contrast_thresh, score, 0.0)

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


def _grad(img):
    gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    return jnp.sqrt(gx * gx + gy * gy), jnp.arctan2(gy, gx)


def _gather(img, yk, xk, dv, du):
    H, W = img.shape
    yi = jnp.clip(yk[:, None] + dv[None, :], 0, H - 1)
    xi = jnp.clip(xk[:, None] + du[None, :], 0, W - 1)
    return img.reshape(-1)[yi * W + xi]


@functools.lru_cache(maxsize=None)
def _window_offsets(rad: int):
    # NumPy (not jnp) constants: jnp arrays created while tracing would be
    # cached as leaked tracers across jit scopes
    vs, us = np.mgrid[-rad:rad + 1, -rad:rad + 1]
    return (vs.reshape(-1).astype(np.int32), us.reshape(-1).astype(np.int32))


def _orientations(mag, ang, yk, xk, rad: int = 8):
    """Dominant gradient orientation per keypoint (36-bin histogram)."""
    dv_np, du_np = _window_offsets(rad)
    dv = jnp.asarray(dv_np)
    du = jnp.asarray(du_np)
    m = _gather(mag, yk, xk, dv, du)                     # (K, P)
    a = _gather(ang, yk, xk, dv, du)
    w = jnp.exp(-(du.astype(jnp.float32) ** 2 + dv.astype(jnp.float32) ** 2)
                / (2.0 * (0.5 * rad) ** 2))
    bins = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    onehot = jax.nn.one_hot(bins, 36, dtype=jnp.float32)  # (K, P, 36)
    hist = jnp.einsum("kp,kpb->kb", m * w[None, :], onehot)
    # light smoothing then argmax
    hist = (jnp.roll(hist, 1, 1) + hist + jnp.roll(hist, -1, 1)) / 3.0
    peak = jnp.argmax(hist, axis=1)
    return (peak.astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi


def _descriptors(mag, ang, yk, xk, theta, cell: int = 4, nbins: int = 8,
                 width: int = 4):
    """SIFT 4x4x8 descriptor per keypoint, (K, 128) float32, normalized."""
    half = cell * width // 2                              # 8
    vs_np, us_np = _window_offsets(half)
    vs = jnp.asarray(vs_np)
    us = jnp.asarray(us_np)
    # rotate sample offsets by keypoint orientation
    ca = jnp.cos(theta)[:, None]
    sa = jnp.sin(theta)[:, None]
    uf = us.astype(jnp.float32)[None, :]
    vf = vs.astype(jnp.float32)[None, :]
    ru = jnp.round(uf * ca - vf * sa).astype(jnp.int32)
    rv = jnp.round(uf * sa + vf * ca).astype(jnp.int32)

    H, W = mag.shape
    yi = jnp.clip(yk[:, None] + rv, 0, H - 1)
    xi = jnp.clip(xk[:, None] + ru, 0, W - 1)
    m = mag.reshape(-1)[yi * W + xi]                      # (K, P)
    a = ang.reshape(-1)[yi * W + xi] - theta[:, None]     # rotated gradient

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

    desc = jnp.zeros((yk.shape[0], width * width * nbins), jnp.float32)
    for dy_ in (0, 1):
        wy = jnp.where(dy_ == 0, 1.0 - fy, fy)
        cy = jnp.clip(gy0 + dy_, 0, width - 1).astype(jnp.int32)
        for dx_ in (0, 1):
            wx = jnp.where(dx_ == 0, 1.0 - fx, fx)
            cx = jnp.clip(gx0 + dx_, 0, width - 1).astype(jnp.int32)
            for da_ in (0, 1):
                wa = jnp.where(da_ == 0, 1.0 - fa, fa)
                cb = (ab0.astype(jnp.int32) + da_) % nbins
                idx = (cy * width + cx) * nbins + cb      # (K, P)
                wgt = base_w * wy * wx * wa
                onehot = jax.nn.one_hot(idx, width * width * nbins,
                                        dtype=jnp.float32)
                desc = desc + jnp.einsum("kp,kpd->kd", wgt, onehot)

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
                            contrast_thresh: float = 1.0) -> ImageFeatures:
    """SIFT-style detect+describe -> padded ImageFeatures with (K, 128)
    float32 descriptors (descriptor width differs from ORB's 256 bits; the
    matcher dispatches on dtype)."""
    H, W = gray.shape
    gray = gray.astype(jnp.float32)
    octaves = _scale_space(gray, num_octaves, scales_per_octave, sigma0)

    quota = max(cfg.max_keypoints // max(len(octaves), 1), 16)
    xs, ys, resp, angs, sizes, levels, valids, descs = \
        [], [], [], [], [], [], [], []

    for o, levels_o in enumerate(octaves):
        dog = jnp.stack([levels_o[i + 1] - levels_o[i]
                         for i in range(len(levels_o) - 1)])
        score = _dog_extrema_scores(dog, contrast_thresh)
        Lh, Hh, Wh = score.shape
        flat = score.reshape(-1)
        top_s, top_i = jax.lax.top_k(flat, quota)
        v = top_s > 0
        li = top_i // (Hh * Wh)
        rem = top_i % (Hh * Wh)
        yk = rem // Wh
        xk = rem % Wh

        # orientation + descriptor from the octave's mid-scale gradient
        mag, angm = _grad(levels_o[scales_per_octave // 2 + 1])
        theta = _orientations(mag, angm, yk, xk)
        d = _descriptors(mag, angm, yk, xk, theta)

        s = float(2 ** o)
        xs.append(xk.astype(jnp.float32) * s)
        ys.append(yk.astype(jnp.float32) * s)
        resp.append(jnp.where(v, top_s, 0.0))
        angs.append(theta)
        sizes.append(sigma0 * (2.0 ** (li.astype(jnp.float32)
                                       / scales_per_octave)) * s * 2.0)
        levels.append(jnp.full((quota,), o, jnp.int32))
        valids.append(v)
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
