"""L0 image substrate: the TPU-native equivalents of the OpenCV core/imgproc
routines the reference leans on (SURVEY.md §1 L0: cvtColor, resize,
GaussianBlur, Sobel, dilate, remap).

Design notes (TPU-first):
- Everything is pure jnp over float32 HWC / HW arrays with static shapes; XLA
  fuses the elementwise chains and maps the separable convolutions onto the
  VPU.
- `remap_*` is the hot gather (ref 圆柱面投影.cpp:157 cv::remap); implemented
  as a fused bilinear gather so the warp stage is one kernel.
- Separable convolutions are shifted multiply-adds on the VPU (single-
  channel spatial convs are hostile to the MXU layout; see _sep_filter2d).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma, matching cv::cvtColor(COLOR_BGR2GRAY) coefficients.

    The reference converts with OpenCV's Y = 0.299 R + 0.587 G + 0.114 B
    (ref 特征点检测.cpp:956-963). `img` is (..., H, W, 3) in RGB order.
    """
    img = img.astype(jnp.float32)
    w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    return img @ w


def gaussian_kernel1d(ksize: int, sigma: float) -> jnp.ndarray:
    """1-D Gaussian taps matching cv::getGaussianKernel semantics.

    If sigma <= 0, OpenCV derives sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8.
    """
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = (ksize - 1) / 2.0
    x = jnp.arange(ksize, dtype=jnp.float32) - r
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _sep_filter2d(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray,
                  border: str = "reflect") -> jnp.ndarray:
    """Separable 2-D filter over (H, W) or (H, W, C) float32 with
    BORDER_REFLECT_101-style padding (OpenCV's default).

    Implemented as shifted multiply-adds (static slices of the padded image)
    rather than lax.conv: XLA lays single-channel spatial convolutions out as
    T(1, 128) — one sublane — and they dominated whole-pipeline time (the
    7-tap blur of a 1080p level cost ~240 ms as a conv vs ~0.3 ms as k fused
    VPU passes)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    rx = (kx.shape[0] - 1) // 2
    ry = (ky.shape[0] - 1) // 2
    mode = {"reflect": "reflect", "edge": "edge", "constant": "constant"}[border]
    # pad rows/cols; jnp "reflect" == OpenCV BORDER_REFLECT_101
    p = jnp.pad(img, ((ry, ry), (rx, rx), (0, 0)), mode=mode)

    ky_l = [float(v) for v in np.asarray(ky)] if isinstance(ky, np.ndarray) \
        else list(ky)
    kx_l = [float(v) for v in np.asarray(kx)] if isinstance(kx, np.ndarray) \
        else list(kx)
    # vertical pass: Σ_t ky[t] · p[t : t+H]
    acc = None
    for t in range(len(ky_l)):
        term = ky_l[t] * p[t:t + H, :, :]
        acc = term if acc is None else acc + term
    # horizontal pass
    out = None
    for t in range(len(kx_l)):
        term = kx_l[t] * acc[:, t:t + W, :]
        out = term if out is None else out + term
    return out[..., 0] if squeeze else out


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0,
                  border: str = "reflect") -> jnp.ndarray:
    """GaussianBlur (ref 特征点检测.cpp:936 uses 7x7 sigma=2 BORDER_REFLECT_101
    before descriptor sampling)."""
    k = gaussian_kernel1d(ksize, sigma)
    return _sep_filter2d(img.astype(jnp.float32), k, k, border)


def sobel(img: jnp.ndarray, dx: int, dy: int, ksize: int = 3) -> jnp.ndarray:
    """Sobel derivative, matching cv::Sobel taps for ksize=3
    (ref 动态规划....cpp:549-573 computeGradients)."""
    assert ksize == 3 and (dx, dy) in ((1, 0), (0, 1))
    smooth = jnp.array([1.0, 2.0, 1.0], jnp.float32)
    diff = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    if dx == 1:
        return _sep_filter2d(img.astype(jnp.float32), diff, smooth)
    return _sep_filter2d(img.astype(jnp.float32), smooth, diff)


def resize(img: jnp.ndarray, out_hw: tuple[int, int],
           method: str = "linear") -> jnp.ndarray:
    """Resample to (H', W'). `linear` matches cv::INTER_LINEAR semantics
    (half-pixel centers), used for pyramid construction
    (ref 特征点检测.cpp:834 INTER_LINEAR_EXACT)."""
    H2, W2 = out_hw
    shape = (H2, W2) + img.shape[2:]
    meth = {"linear": "linear", "nearest": "nearest", "cubic": "cubic"}[method]
    return jax.image.resize(img.astype(jnp.float32), shape, method=meth)


def _gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather: img[(yi, xi)] with (..., C) channel support."""
    H, W = img.shape[:2]
    yi = jnp.clip(yi, 0, H - 1)
    xi = jnp.clip(xi, 0, W - 1)
    flat = img.reshape((H * W,) + img.shape[2:])
    return jnp.take(flat, yi * W + xi, axis=0)


def remap_bilinear(img: jnp.ndarray, xmap: jnp.ndarray, ymap: jnp.ndarray,
                   border_value: float = 0.0):
    """Bilinear remap (the hot gather of the warp stage; ref
    圆柱面投影.cpp:145-157 buildMaps + cv::remap INTER_LINEAR).

    img: (H, W) or (H, W, C) float32. xmap/ymap: (H', W') float32 source
    coordinates. Out-of-range samples get `border_value` and valid=False.

    Returns (out, valid) where out is (H', W'[, C]) and valid is (H', W') bool.
    """
    img = img.astype(jnp.float32)
    H, W = img.shape[:2]
    x0 = jnp.floor(xmap)
    y0 = jnp.floor(ymap)
    fx = xmap - x0
    fy = ymap - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    Ia = _gather2d(img, y0i, x0i)
    Ib = _gather2d(img, y0i, x0i + 1)
    Ic = _gather2d(img, y0i + 1, x0i)
    Id = _gather2d(img, y0i + 1, x0i + 1)

    if img.ndim == 3:
        fx_ = fx[..., None]
        fy_ = fy[..., None]
    else:
        fx_, fy_ = fx, fy
    top = Ia + (Ib - Ia) * fx_
    bot = Ic + (Id - Ic) * fx_
    out = top + (bot - top) * fy_

    valid = ((xmap >= 0) & (xmap <= W - 1) & (ymap >= 0) & (ymap <= H - 1))
    vmask = valid[..., None] if img.ndim == 3 else valid
    out = jnp.where(vmask, out, border_value)
    return out, valid


def remap_nearest(img: jnp.ndarray, xmap: jnp.ndarray, ymap: jnp.ndarray,
                  border_value: float = 0.0):
    """Nearest-neighbour remap (masks are warped INTER_NEAREST/BORDER_CONSTANT
    in the reference driver, 特征点检测.cpp:1107-1109)."""
    H, W = img.shape[:2]
    xi = jnp.round(xmap).astype(jnp.int32)
    yi = jnp.round(ymap).astype(jnp.int32)
    out = _gather2d(img, yi, xi)
    valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
    vmask = valid[..., None] if img.ndim == 3 else valid
    out = jnp.where(vmask, out, border_value)
    return out, valid


def _morph(img: jnp.ndarray, ksize: tuple[int, int], op: str) -> jnp.ndarray:
    """Rectangular-kernel morphology, SEPARABLE: max/min over a kh x kw rect
    = row pass then column pass (kh + kw window elements per pixel instead
    of kh*kw — a 20x20 dilate is 10x cheaper; XLA does not do this rewrite
    itself and the naive 400-element window dominated whole-pipeline time)."""
    kh, kw = ksize
    init = -jnp.inf if op == "max" else jnp.inf
    fn = lax.max if op == "max" else lax.min
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    x = lax.reduce_window(
        x, init, fn, (kh, 1, 1), (1, 1, 1),
        ((kh // 2, (kh - 1) // 2), (0, 0), (0, 0)))
    x = lax.reduce_window(
        x, init, fn, (1, kw, 1), (1, 1, 1),
        ((0, 0), (kw // 2, (kw - 1) // 2), (0, 0)))
    return x[..., 0] if squeeze else x


def dilate(img: jnp.ndarray, ksize: tuple[int, int] = (3, 3)) -> jnp.ndarray:
    """cv::dilate with a rect kernel (ref 特征点检测.cpp:1157-1173 dilates seam
    masks with a 20x20 rect before blending)."""
    return _morph(img, ksize, "max")


def erode(img: jnp.ndarray, ksize: tuple[int, int] = (3, 3)) -> jnp.ndarray:
    return _morph(img, ksize, "min")


def box_filter(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Normalized box filter (separable)."""
    k = jnp.full((ksize,), 1.0 / ksize, jnp.float32)
    return _sep_filter2d(img.astype(jnp.float32), k, k)
