"""Warper tests: forward/backward consistency per projector, identity-plane
round trip, canvas placement, mask handling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagestitch_tpu.warp import PROJECTORS, warp_image, warp_point
from imagestitch_tpu.warp.projectors import _camera_mats


def make_K(f=500.0, ppx=160.0, ppy=120.0):
    return jnp.asarray([[f, 0, ppx], [0, f, ppy], [0, 0, 1]], jnp.float32)


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return jnp.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)


@pytest.mark.parametrize("kind", list(PROJECTORS.keys()))
def test_forward_backward_roundtrip(kind):
    """backward(forward(x)) == x for in-view pixels, any rotation."""
    K = make_K()
    R = rot_y(0.2)
    proj = PROJECTORS[kind](K, R, 500.0)
    xs = jnp.linspace(20.0, 300.0, 12)
    ys = jnp.linspace(20.0, 220.0, 9)
    gx, gy = jnp.meshgrid(xs, ys)
    u, v = proj.forward(gx, gy)
    x2, y2, ok = proj.backward(u, v)
    ok = np.asarray(ok)
    assert ok.mean() > 0.95
    err = np.hypot(np.asarray(x2) - np.asarray(gx),
                   np.asarray(y2) - np.asarray(gy))
    assert err[ok].max() < 0.05


def test_plane_identity_is_translation_only():
    """Plane projector with R=I and scale=f reproduces the source image up to
    the principal-point offset."""
    K = make_K(400.0, 160.0, 120.0)
    proj = PROJECTORS["plane"](K, jnp.eye(3), 400.0)
    u, v = proj.forward(jnp.asarray([160.0]), jnp.asarray([120.0]))
    # principal axis maps to (0, 0) on the plane
    assert abs(float(u[0])) < 1e-3 and abs(float(v[0])) < 1e-3


def test_warp_image_identity_plane_content():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    K = make_K(300.0, 80.0, 60.0)
    res = jax.jit(lambda im: warp_image(im, K, jnp.eye(3), 300.0,
                                        (256, 256), "plane"))(jnp.asarray(img))
    m = np.asarray(res.mask)
    out = np.asarray(res.image)
    corner = np.asarray(res.corner)
    assert m.sum() > 0.9 * 120 * 160  # nearly all source pixels covered
    # plane coords = source - principal point (R=I, scale=f), so the source
    # center (ppx, ppy) = (80, 60) lands at plane (0,0) = canvas -corner
    cy, cx = -corner[1], -corner[0]
    assert np.allclose(out[cy, cx], img[60, 80], atol=2.0)
    # every invalid pixel is zeroed
    assert np.all(out[~m] == 0)


def test_warp_point_center_cylindrical():
    """The principal ray maps to (0, 0) on the cylinder when R = I."""
    K = make_K(500.0, 160.0, 120.0)
    uv = warp_point(jnp.asarray([[160.0, 120.0]]), K, jnp.eye(3), 500.0,
                    "cylindrical")
    assert np.allclose(np.asarray(uv), 0.0, atol=1e-4)


def test_warp_image_mask_respected():
    img = jnp.ones((64, 64), jnp.float32) * 100.0
    mask = jnp.zeros((64, 64), jnp.float32).at[:32].set(1.0)
    K = make_K(200.0, 32.0, 32.0)
    res = warp_image(img, K, jnp.eye(3), 200.0, (128, 128), "plane",
                     mask=mask)
    # only the unmasked half contributes
    assert np.asarray(res.mask).sum() < 0.6 * 64 * 64
    assert np.asarray(res.mask).sum() > 0.4 * 64 * 64


def test_cylindrical_straightens_rotation():
    """Two cameras differing by a y-rotation map the same world ray to
    cylinder coords differing by exactly scale*angle in u."""
    K = make_K(500.0, 0.0, 0.0)
    p1 = PROJECTORS["cylindrical"](K, jnp.eye(3), 500.0)
    p2 = PROJECTORS["cylindrical"](K, rot_y(0.1), 500.0)
    u1, v1 = p1.forward(jnp.asarray([0.0]), jnp.asarray([0.0]))
    u2, v2 = p2.forward(jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert abs(float((u2 - u1)[0]) - 500.0 * 0.1) < 1e-2
    assert abs(float((v2 - v1)[0])) < 1e-3
