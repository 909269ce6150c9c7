"""L0 image-op tests: convolution parity with NumPy references, remap
round-trips, morphology. (The reference has no tests at all — SURVEY.md §4 —
its correctness standard is differential vs OpenCV; here each op is checked
against an independent NumPy implementation.)"""

import numpy as np
import jax.numpy as jnp
import pytest

from imagestitch_tpu.ops import (
    rgb_to_gray, gaussian_kernel1d, gaussian_blur, sobel, resize,
    remap_bilinear, remap_nearest, dilate, erode, build_pyramid, level_scale,
)
from imagestitch_tpu.ops.pyramid import level_shape


def test_rgb_to_gray_coeffs():
    img = np.zeros((4, 4, 3), np.float32)
    img[..., 0] = 100  # R
    g = np.asarray(rgb_to_gray(jnp.asarray(img)))
    assert np.allclose(g, 29.9, atol=1e-3)


def test_gaussian_kernel_normalized():
    k = np.asarray(gaussian_kernel1d(7, 2.0))
    assert k.shape == (7,)
    assert np.isclose(k.sum(), 1.0, atol=1e-6)
    assert np.all(k[:3] == k[:3][::-1][::-1])  # symmetric
    assert np.argmax(k) == 3


def test_gaussian_blur_constant_preserved():
    img = jnp.full((32, 40), 7.0)
    out = np.asarray(gaussian_blur(img, 7, 2.0))
    assert out.shape == (32, 40)
    assert np.allclose(out, 7.0, atol=1e-4)


def test_gaussian_blur_matches_numpy_conv():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (16, 20)).astype(np.float32)
    k = np.asarray(gaussian_kernel1d(5, 1.1))
    pad = np.pad(img, 2, mode="reflect")
    ref = np.zeros_like(img)
    for i in range(16):
        for j in range(20):
            patch = pad[i:i + 5, j:j + 5]
            ref[i, j] = k @ patch @ k
    out = np.asarray(gaussian_blur(jnp.asarray(img), 5, 1.1))
    assert np.allclose(out, ref, atol=1e-3)


def test_sobel_gradient_direction():
    # ramp in x: dx response constant 8 (sobel sum), dy response ~0
    x = np.tile(np.arange(20, dtype=np.float32), (16, 1))
    gx = np.asarray(sobel(jnp.asarray(x), 1, 0))
    gy = np.asarray(sobel(jnp.asarray(x), 0, 1))
    assert np.allclose(gx[2:-2, 2:-2], 8.0, atol=1e-4)
    assert np.allclose(gy[2:-2, 2:-2], 0.0, atol=1e-4)


def test_resize_shapes_and_range():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (48, 64, 3)))
    out = np.asarray(resize(img, (24, 32)))
    assert out.shape == (24, 32, 3)
    assert out.min() >= -1 and out.max() <= 256


def test_remap_identity():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (12, 15)).astype(np.float32)
    yy, xx = np.mgrid[0:12, 0:15].astype(np.float32)
    out, valid = remap_bilinear(jnp.asarray(img), jnp.asarray(xx),
                                jnp.asarray(yy))
    assert np.asarray(valid).all()
    assert np.allclose(np.asarray(out), img, atol=1e-4)


def test_remap_halfpixel_shift_interpolates():
    img = np.zeros((8, 8), np.float32)
    img[:, 4] = 10.0
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float32)
    out, _ = remap_bilinear(jnp.asarray(img), jnp.asarray(xx + 0.5),
                            jnp.asarray(yy))
    out = np.asarray(out)
    assert np.allclose(out[:, 3], 5.0, atol=1e-4)
    assert np.allclose(out[:, 4], 5.0, atol=1e-4)


def test_remap_out_of_range_invalid():
    img = jnp.ones((8, 8))
    xmap = jnp.full((4, 4), -5.0)
    ymap = jnp.full((4, 4), 2.0)
    out, valid = remap_bilinear(img, xmap, ymap, border_value=0.0)
    assert not np.asarray(valid).any()
    assert np.allclose(np.asarray(out), 0.0)
    out_n, valid_n = remap_nearest(img, xmap, ymap)
    assert not np.asarray(valid_n).any()


def test_dilate_erode():
    img = np.zeros((9, 9), np.float32)
    img[4, 4] = 1.0
    d = np.asarray(dilate(jnp.asarray(img), (3, 3)))
    assert d[3:6, 3:6].sum() == 9.0 and d.sum() == 9.0
    e = np.asarray(erode(jnp.asarray(d), (3, 3)))
    assert e[4, 4] == 1.0 and e.sum() == 1.0


def test_pyramid_shapes():
    img = jnp.zeros((480, 640))
    pyr = build_pyramid(img, nlevels=5, scale_factor=1.3)
    assert len(pyr) == 5
    for l, lvl in enumerate(pyr):
        assert lvl.shape == level_shape((480, 640), l, 1.3)
    assert pyr[0].shape == (480, 640)
    assert pyr[4].shape == (round(480 / 1.3 ** 4), round(640 / 1.3 ** 4))
    assert level_scale(2, 1.3) == pytest.approx(1.69)
