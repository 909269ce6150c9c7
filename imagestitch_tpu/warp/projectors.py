"""Rotation-warper projection math.

Reconstruction of ref 圆柱面投影.cpp mapForward/mapBackward (:37-62) plus the
alternative projections the reference driver references as stock OpenCV
warpers (Plane/Spherical/Fisheye/Stereographic, commented at
特征点检测.cpp:1092-1097). Each projector is a pair of pure functions:

  forward(x, y)  : source pixel -> projected plane coords (u, v)
  backward(u, v) : projected coords -> source pixel (x, y) + validity

parameterized by (K, R, scale). All math is elementwise over coordinate
grids (VPU work) — the reference's per-pixel loops become whole-grid ops.
Conventions match the reference: ray = R·K⁻¹·[x,y,1]ᵀ on the forward path,
K·Rᵀ·(unit-surface point) with perspective divide (z>0 required) backward.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = jnp.pi


def _camera_mats(K: jnp.ndarray, R: jnp.ndarray):
    """r_kinv = R·K⁻¹ (forward), k_rinv = K·R⁻¹ (backward), as the reference
    precomputes in setCameraParams (ref :90-119). The reference uses Rᵀ for
    the backward path, which assumes R is a true rotation; chained-homography
    cameras (e.g. a translation-model pair without bundle adjustment) yield
    non-orthogonal R, so the general inverse is used — identical for real
    rotations, correct for the rest."""
    Kinv = jnp.linalg.inv(K.astype(jnp.float32))
    r_kinv = R.astype(jnp.float32) @ Kinv
    k_rinv = K.astype(jnp.float32) @ jnp.linalg.inv(R.astype(jnp.float32))
    return r_kinv, k_rinv


def _ray(r_kinv, x, y):
    ones = jnp.ones_like(x)
    X = r_kinv[0, 0] * x + r_kinv[0, 1] * y + r_kinv[0, 2] * ones
    Y = r_kinv[1, 0] * x + r_kinv[1, 1] * y + r_kinv[1, 2] * ones
    Z = r_kinv[2, 0] * x + r_kinv[2, 1] * y + r_kinv[2, 2] * ones
    return X, Y, Z


def _project(k_rinv, X, Y, Z):
    """K·Rᵀ projection with z>0 validity (ref mapBackward :52-62: z<=0 maps
    to (-1,-1), i.e. invalid)."""
    x = k_rinv[0, 0] * X + k_rinv[0, 1] * Y + k_rinv[0, 2] * Z
    y = k_rinv[1, 0] * X + k_rinv[1, 1] * Y + k_rinv[1, 2] * Z
    z = k_rinv[2, 0] * X + k_rinv[2, 1] * Y + k_rinv[2, 2] * Z
    valid = z > 0
    zsafe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return x / zsafe, y / zsafe, valid


class Projector:
    """Base: subclasses define surface <-> ray maps."""

    def __init__(self, K, R, scale):
        self.scale = jnp.float32(scale)
        self.r_kinv, self.k_rinv = _camera_mats(K, R)

    def forward(self, x, y):
        X, Y, Z = _ray(self.r_kinv, x, y)
        return self._surface_from_ray(X, Y, Z)

    def backward(self, u, v):
        X, Y, Z = self._ray_from_surface(u, v)
        return _project(self.k_rinv, X, Y, Z)


class CylindricalProjector(Projector):
    """u = s·atan2(x̂, ẑ), v = s·ŷ/√(x̂²+ẑ²)  (ref mapForward :37-45);
    backward: (sin u, v, cos u) unit-cylinder point (ref :47-62)."""

    def _surface_from_ray(self, X, Y, Z):
        u = self.scale * jnp.arctan2(X, Z)
        denom = jnp.sqrt(X * X + Z * Z)
        v = self.scale * Y / jnp.maximum(denom, 1e-12)
        return u, v

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        return jnp.sin(u), v, jnp.cos(u)


class SphericalProjector(Projector):
    """u = s·atan2(x̂, ẑ), v = s·(π − acos(ŷ/|r|)) (OpenCV SphericalProjector)."""

    def _surface_from_ray(self, X, Y, Z):
        u = self.scale * jnp.arctan2(X, Z)
        norm = jnp.sqrt(X * X + Y * Y + Z * Z)
        w = jnp.clip(Y / jnp.maximum(norm, 1e-12), -1.0, 1.0)
        v = self.scale * (PI - jnp.arccos(w))
        return u, v

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        sinv = jnp.sin(PI - v)
        return sinv * jnp.sin(u), jnp.cos(PI - v), sinv * jnp.cos(u)


class PlaneProjector(Projector):
    """u = s·x̂/ẑ, v = s·ŷ/ẑ (OpenCV PlaneProjector with t = 0)."""

    def _surface_from_ray(self, X, Y, Z):
        zsafe = jnp.where(jnp.abs(Z) < 1e-12, 1e-12, Z)
        return self.scale * X / zsafe, self.scale * Y / zsafe

    def _ray_from_surface(self, u, v):
        return u / self.scale, v / self.scale, jnp.ones_like(u)


class FisheyeProjector(Projector):
    """Equidistant fisheye (OpenCV FisheyeProjector): polar angle times the
    azimuth direction."""

    def _surface_from_ray(self, X, Y, Z):
        u_ = jnp.arctan2(X, Z)
        norm = jnp.sqrt(X * X + Y * Y + Z * Z)
        v_ = PI - jnp.arccos(jnp.clip(Y / jnp.maximum(norm, 1e-12),
                                      -1.0, 1.0))
        return self.scale * v_ * jnp.cos(u_), self.scale * v_ * jnp.sin(u_)

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        u_ = jnp.arctan2(v, u)
        v_ = jnp.sqrt(u * u + v * v)
        sinv = jnp.sin(PI - v_)
        return sinv * jnp.sin(u_), jnp.cos(PI - v_), sinv * jnp.cos(u_)


class StereographicProjector(Projector):
    """Stereographic projection (OpenCV StereographicProjector)."""

    def _surface_from_ray(self, X, Y, Z):
        u_ = jnp.arctan2(X, Z)
        norm = jnp.sqrt(X * X + Y * Y + Z * Z)
        v_ = PI - jnp.arccos(jnp.clip(Y / jnp.maximum(norm, 1e-12),
                                      -1.0, 1.0))
        r = jnp.sin(v_) / jnp.maximum(1.0 - jnp.cos(v_), 1e-12)
        return self.scale * r * jnp.cos(u_), self.scale * r * jnp.sin(u_)

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        u_ = jnp.arctan2(v, u)
        r = jnp.sqrt(u * u + v * v)
        v_ = 2.0 * jnp.arctan(1.0 / jnp.maximum(r, 1e-12))
        sinv = jnp.sin(PI - v_)
        return sinv * jnp.sin(u_), jnp.cos(PI - v_), sinv * jnp.cos(u_)


def _sphere_angles(X, Y, Z):
    """(azimuth u_, latitude v_) with v_ = asin(ŷ/|r|) — the convention of
    OpenCV's Mercator/TransverseMercator/CompressedRectilinear/Panini
    projectors (y points down, v_ measured from the equator)."""
    u_ = jnp.arctan2(X, Z)
    norm = jnp.sqrt(X * X + Y * Y + Z * Z)
    v_ = jnp.arcsin(jnp.clip(Y / jnp.maximum(norm, 1e-12), -1.0, 1.0))
    return u_, v_


def _ray_from_angles(u_, v_):
    cosv = jnp.cos(v_)
    return cosv * jnp.sin(u_), jnp.sin(v_), cosv * jnp.cos(u_)


class MercatorProjector(Projector):
    """u = s·u_, v = s·ln tan(π/4 + v_/2); inverse v_ = atan(sinh v)
    (OpenCV MercatorProjector; backward map exact vs cv2 5.0)."""

    def _surface_from_ray(self, X, Y, Z):
        u_, v_ = _sphere_angles(X, Y, Z)
        return (self.scale * u_,
                self.scale * jnp.log(jnp.tan(PI / 4 + v_ / 2)))

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        return _ray_from_angles(u, jnp.arctan(jnp.sinh(v)))


class TransverseMercatorProjector(Projector):
    """b = cos v_·sin u_; u = (s/2)·ln((1+b)/(1−b)) = s·artanh b,
    v = s·atan2(tan v_, cos u_); inverse v_ = asin(sin v / cosh u),
    u_ = atan2(sinh u, cos v) (OpenCV TransverseMercatorProjector)."""

    def _surface_from_ray(self, X, Y, Z):
        u_, v_ = _sphere_angles(X, Y, Z)
        b = jnp.clip(jnp.cos(v_) * jnp.sin(u_), -1.0 + 1e-7, 1.0 - 1e-7)
        return (self.scale / 2 * jnp.log((1.0 + b) / (1.0 - b)),
                self.scale * jnp.arctan2(jnp.tan(v_), jnp.cos(u_)))

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        v_ = jnp.arcsin(jnp.clip(jnp.sin(v) / jnp.cosh(u), -1.0, 1.0))
        u_ = jnp.arctan2(jnp.sinh(u), jnp.cos(v))
        return _ray_from_angles(u_, v_)


class CompressedRectilinearProjector(Projector):
    """u = s·a·tan(u_/a), v = s·b·tan v_ / cos u_ (OpenCV
    CompressedRectilinearProjector, kinds compressedPlaneA{2,1.5}B1)."""

    a: float = 1.0
    b: float = 1.0

    def _surface_from_ray(self, X, Y, Z):
        u_, v_ = _sphere_angles(X, Y, Z)
        return (self.scale * self.a * jnp.tan(u_ / self.a),
                self.scale * self.b * jnp.tan(v_) / jnp.cos(u_))

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        u_ = self.a * jnp.arctan(u / self.a)
        v_ = jnp.arctan(v * jnp.cos(u_) / self.b)
        return _ray_from_angles(u_, v_)


class PaniniProjector(Projector):
    """u = s·a·tan(u_/a), v = s·b·(a·tan(u_/a))·tan v_ / sin u_ with the
    sin u_ → 0 limit b·tan v_ (OpenCV PaniniProjector,
    kinds paniniA{2,1.5}B1)."""

    a: float = 1.0
    b: float = 1.0

    def _surface_from_ray(self, X, Y, Z):
        u_, v_ = _sphere_angles(X, Y, Z)
        tg = self.a * jnp.tan(u_ / self.a)
        sinu = jnp.sin(u_)
        small = jnp.abs(sinu) < 1e-7
        ratio = jnp.where(small, 1.0,
                          tg / jnp.where(small, 1.0, sinu))
        return (self.scale * tg,
                self.scale * self.b * ratio * jnp.tan(v_))

    def _ray_from_surface(self, u, v):
        u = u / self.scale
        v = v / self.scale
        lam = self.a * jnp.arctan(u / self.a)
        small = jnp.abs(lam) < 1e-7
        denom = self.b * self.a * jnp.tan(
            jnp.where(small, 1.0, lam) / self.a)
        t = jnp.where(small, v / self.b, v * jnp.sin(lam) / denom)
        return _ray_from_angles(lam, jnp.arctan(t))


def _with_ab(cls, a, b):
    return type(f"{cls.__name__}_a{a}b{b}", (cls,), {"a": a, "b": b})


PROJECTORS = {
    "cylindrical": CylindricalProjector,
    "spherical": SphericalProjector,
    "plane": PlaneProjector,
    "fisheye": FisheyeProjector,
    "stereographic": StereographicProjector,
    # OpenCV PyRotationWarper's extended family, same kind strings as cv2
    "mercator": MercatorProjector,
    "transverseMercator": TransverseMercatorProjector,
    "compressedPlaneA2B1": _with_ab(CompressedRectilinearProjector, 2.0, 1.0),
    "compressedPlaneA1.5B1": _with_ab(
        CompressedRectilinearProjector, 1.5, 1.0),
    "paniniA2B1": _with_ab(PaniniProjector, 2.0, 1.0),
    "paniniA1.5B1": _with_ab(PaniniProjector, 1.5, 1.0),
}
