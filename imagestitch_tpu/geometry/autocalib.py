"""Focal length auto-calibration from pairwise homographies.

Reconstruction of ref 恢复相机内参数.cpp focalsFromHomography1 (:26-54) and
estimateFocal1 (:55-107): closed-form focal candidates from the entries of
each pairwise H, geometric mean per pair, median across pairs, image-size
fallback when too few pairs yield estimates. Fully jittable over a padded
pair set with validity masks (the reference loops over a std::vector).
"""

from __future__ import annotations

import jax.numpy as jnp


def focals_from_homography(H: jnp.ndarray):
    """Closed-form focal candidates (f0 for the source camera, f1 for the
    destination) from one homography (ref :26-54).

    H: (3, 3). Returns (f0, f1, f0_ok, f1_ok); values are garbage when the
    corresponding ok flag is False (masked out by the caller).
    """
    h = H.reshape(-1)

    def pick(v1, v2, d1, d2):
        lo = jnp.minimum(v1, v2)
        hi = jnp.maximum(v1, v2)
        both = (lo > 0) & (hi > 0)
        sel = jnp.where(jnp.abs(d1) > jnp.abs(d2), hi, lo)
        f = jnp.where(both, jnp.sqrt(jnp.maximum(sel, 0.0)),
                      jnp.sqrt(jnp.maximum(hi, 0.0)))
        ok = hi > 0
        return f, ok

    d1 = h[6] * h[7]
    d2 = (h[7] - h[6]) * (h[7] + h[6])
    safe = lambda d: jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    v1 = -(h[0] * h[1] + h[3] * h[4]) / safe(d1)
    v2 = (h[0] * h[0] + h[3] * h[3] - h[1] * h[1] - h[4] * h[4]) / safe(d2)
    f1, f1_ok = pick(v1, v2, d1, d2)

    d1b = h[0] * h[3] + h[1] * h[4]
    d2b = h[0] * h[0] + h[1] * h[1] - h[3] * h[3] - h[4] * h[4]
    w1 = -h[2] * h[5] / safe(d1b)
    w2 = (h[5] * h[5] - h[2] * h[2]) / safe(d2b)
    f0, f0_ok = pick(w1, w2, d1b, d2b)
    return f0, f1, f0_ok, f1_ok


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over masked entries (invalid entries sort to +inf), matching the
    sorted-middle convention of ref :94-96."""
    n = jnp.sum(mask.astype(jnp.int32))
    xs = jnp.sort(jnp.where(mask, x, jnp.inf))
    lo = xs[jnp.maximum((n - 1) // 2, 0)]
    hi = xs[jnp.maximum(n // 2, 0)]
    return 0.5 * (lo + hi)


def estimate_focal(Hs: jnp.ndarray, pair_valid: jnp.ndarray,
                   img_sizes: jnp.ndarray, num_images: int) -> jnp.ndarray:
    """Scalar shared focal estimate (ref estimateFocal1 :55-107).

    Hs: (P, 3, 3) pairwise homographies; pair_valid: (P,) bool;
    img_sizes: (N, 2) int32 (height, width). Collects sqrt(f0*f1) per valid
    pair where both candidates are OK, takes the median if at least
    num_images-1 estimates exist, otherwise falls back to the mean of
    (width+height) over images (ref's naive fallback).

    Like the reference (whose MatchesInfo set holds BOTH directed pairs,
    dual pairs carrying H⁻¹ — ref 特征点匹配.cpp:84-95 — and estimateFocal1
    loops over all of them, :84-96), each undirected pair contributes TWO
    estimates: one from H and one from H⁻¹. The closed-form candidates are
    not symmetric under inversion, and the extra estimates matter: on the
    real-photo fixture the single-direction median was 17% off the true
    focal while the dual-direction one (and cv2's) lands within 3%.
    """
    eye = jnp.eye(3, dtype=Hs.dtype)
    Hsafe = jnp.where(pair_valid[:, None, None], Hs, eye)
    Hall = jnp.concatenate([Hsafe, jnp.linalg.inv(Hsafe)])
    valid_all = jnp.concatenate([pair_valid, pair_valid])
    f0, f1, ok0, ok1 = jnp.vectorize(
        focals_from_homography, signature="(a,b)->(),(),(),()")(Hall)
    ok = ok0 & ok1 & valid_all
    fpair = jnp.sqrt(jnp.maximum(f0 * f1, 0.0))
    n_est = jnp.sum(ok.astype(jnp.int32))
    med = _masked_median(fpair, ok)
    sizes = img_sizes.astype(jnp.float32)
    naive = jnp.mean(sizes[:, 0] + sizes[:, 1])
    use_med = (n_est >= num_images - 1) & jnp.isfinite(med) & (med > 0)
    return jnp.where(use_med, med, naive).astype(jnp.float32)
