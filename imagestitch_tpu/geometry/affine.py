"""Batched-hypothesis RANSAC affine estimation (the SCANS motion model).

Not part of the reference's seven programs (which are rotation-model
panoramas); provided for the cv2.Stitcher SCANS capability family —
OpenCV's estimateAffinePartial2D / estimateAffine2D consumed by
AffineBestOf2NearestMatcher and AffineBasedEstimator. Same TPU-first shape
as geometry.ransac: a fixed batch of minimal samples (2 points for the
4-DoF partial/similarity model, 3 for the 6-DoF full affine) is solved and
scored in one dispatch; the winner is refit by masked least squares —
exact for this linear model, so it IS the converged LM refinement OpenCV
runs (refineIters).

All transforms travel as (3, 3) float32 with last row (0, 0, 1), so the
downstream contracts (MatchesInfo.H, warp k_rinv) are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagestitch_tpu.config import RansacConfig
from imagestitch_tpu.parallel.mesh import shard_hint
from imagestitch_tpu.geometry.ransac import RansacResult


def _promote(P: jnp.ndarray) -> jnp.ndarray:
    """(2, 3) affine -> (3, 3) with last row (0, 0, 1)."""
    return jnp.concatenate(
        [P, jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)], axis=0)


def solve_affine_partial_2p(src2: jnp.ndarray, dst2: jnp.ndarray):
    """Similarity (rotation+scale+translation) from 2 correspondences.

    dst = [a, -b; b, a] src + t — (a + ib) is the complex ratio of the
    point differences. Returns ((3, 3), ok)."""
    ds = src2[1] - src2[0]
    dd = dst2[1] - dst2[0]
    n2 = ds[0] * ds[0] + ds[1] * ds[1]
    ok = n2 > 1e-8
    n2s = jnp.maximum(n2, 1e-8)
    a = (dd[0] * ds[0] + dd[1] * ds[1]) / n2s
    b = (dd[1] * ds[0] - dd[0] * ds[1]) / n2s
    tx = dst2[0, 0] - (a * src2[0, 0] - b * src2[0, 1])
    ty = dst2[0, 1] - (b * src2[0, 0] + a * src2[0, 1])
    P = jnp.asarray([[a, -b, tx], [b, a, ty]], jnp.float32)
    return _promote(P), ok


def solve_affine_3p(src3: jnp.ndarray, dst3: jnp.ndarray):
    """Full 6-DoF affine from 3 correspondences: two 3x3 solves against
    [x, y, 1]. Returns ((3, 3), ok)."""
    S = jnp.concatenate([src3, jnp.ones((3, 1), jnp.float32)], axis=1)
    det = jnp.linalg.det(S)
    span = jnp.maximum(jnp.max(jnp.abs(src3)), 1.0)
    ok = jnp.abs(det) > 1e-5 * span * span
    Ssafe = jnp.where(ok, S, jnp.eye(3, dtype=jnp.float32))
    rows = jnp.linalg.solve(Ssafe, dst3)               # (3, 2): [row_x row_y]
    P = rows.T                                          # (2, 3)
    return _promote(P.astype(jnp.float32)), ok


def affine_error_sq(A: jnp.ndarray, src: jnp.ndarray,
                    dst: jnp.ndarray) -> jnp.ndarray:
    """Squared transfer error ||A·[src,1] − dst||², (N,). No divide — the
    last row is (0, 0, 1)."""
    x = A[0, 0] * src[:, 0] + A[0, 1] * src[:, 1] + A[0, 2]
    y = A[1, 0] * src[:, 0] + A[1, 1] * src[:, 1] + A[1, 2]
    dx = x - dst[:, 0]
    dy = y - dst[:, 1]
    return dx * dx + dy * dy


def ls_affine(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray,
              partial: bool):
    """Masked least-squares affine fit (the exact minimizer; OpenCV's
    refineIters LM lands here). w: (N,) float weights. Returns ((3,3), ok).

    partial=True constrains to the 4-DoF similarity [a, -b, tx; b, a, ty]
    (per-point rows [x, -y, 1, 0] and [y, x, 0, 1] — a 4x4 normal system);
    partial=False solves the 6-DoF normal equations XᵀWX (3x3) twice."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    if partial:
        # accumulate the 4x4 normal matrix of rows r1=[x,-y,1,0], r2=[y,x,0,1]
        sw = jnp.sum(w)
        sxx = jnp.sum(w * (x * x + y * y))
        sx = jnp.sum(w * x)
        sy = jnp.sum(w * y)
        A4 = jnp.asarray([
            [sxx, 0.0, sx, sy],
            [0.0, sxx, -sy, sx],
            [sx, -sy, sw, 0.0],
            [sy, sx, 0.0, sw]], jnp.float32)
        b4 = jnp.asarray([
            jnp.sum(w * (x * u + y * v)),
            jnp.sum(w * (x * v - y * u)),
            jnp.sum(w * u),
            jnp.sum(w * v)], jnp.float32)
        ok = sw >= 2
        sol = jnp.linalg.solve(
            A4 + 1e-8 * jnp.eye(4, dtype=jnp.float32), b4)
        a, b, tx, ty = sol[0], sol[1], sol[2], sol[3]
        P = jnp.asarray([[a, -b, tx], [b, a, ty]], jnp.float32)
    else:
        X = jnp.stack([x, y, jnp.ones_like(x)], axis=1)     # (N, 3)
        Xw = X * w[:, None]
        G = X.T @ Xw                                        # (3, 3)
        ok = jnp.sum(w) >= 3
        Gs = G + 1e-8 * jnp.eye(3, dtype=jnp.float32)
        rows = jnp.linalg.solve(Gs, Xw.T @ dst)             # (3, 2)
        P = rows.T.astype(jnp.float32)
    A = _promote(P)
    ok = ok & jnp.all(jnp.isfinite(A))
    return A, ok


def find_affine(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray,
                key: jax.Array, cfg: RansacConfig = RansacConfig(),
                partial: bool = True) -> RansacResult:
    """RANSAC affine (partial: 2-point similarity samples; full: 3-point)
    + least-squares refit on the winner's inliers. Same contract as
    find_homography: (N, 2) padded points, (N,) mask, RansacResult with a
    (3, 3) promoted matrix. Matches OpenCV estimateAffine(Partial)2D's
    RANSAC (default ransacReprojThreshold 3) + refine semantics."""
    N = src.shape[0]
    B = cfg.num_hypotheses
    P = 2 if partial else 3
    nvalid = jnp.sum(mask.astype(jnp.int32))
    order = jnp.argsort(jnp.logical_not(mask), stable=True)

    u = jax.random.uniform(key, (B, P))
    u = shard_hint(u, "model", 0)
    raw = jnp.floor(u * jnp.maximum(nvalid, 1).astype(jnp.float32))
    raw = jnp.clip(raw.astype(jnp.int32), 0, jnp.maximum(nvalid - 1, 0))
    idx = order[raw]                                   # (B, P)

    srcP = src[idx]                                    # (B, P, 2)
    dstP = dst[idx]

    # distinct sample indices (we sample with replacement and reject)
    distinct = jnp.sum(
        (idx[:, :, None] == idx[:, None, :]).astype(jnp.int32),
        axis=(1, 2)) == P

    if partial:
        As, ok_solve = jax.vmap(solve_affine_partial_2p)(srcP, dstP)
    else:
        As, ok_solve = jax.vmap(solve_affine_3p)(srcP, dstP)
    hyp_ok = distinct & ok_solve & (nvalid >= P)

    thresh2 = jnp.float32(cfg.reproj_threshold ** 2)
    errs = jax.vmap(affine_error_sq, in_axes=(0, None, None))(As, src, dst)
    inl = (errs <= thresh2) & mask[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    counts = jnp.where(hyp_ok, counts, -1)

    best = jnp.argmax(counts)
    A_best = As[best]
    best_count = counts[best]
    inliers0 = inl[best]

    A_fit, fit_ok = ls_affine(src, dst, inliers0.astype(jnp.float32),
                              partial)
    A_ref = jnp.where(fit_ok, A_fit, A_best)
    err_f = affine_error_sq(A_ref, src, dst)
    inliers = (err_f <= thresh2) & mask
    num = jnp.sum(inliers.astype(jnp.int32))

    ok = (best_count >= P) & (num >= P) & jnp.all(jnp.isfinite(A_ref))
    A_out = jnp.where(ok, A_ref, jnp.eye(3, dtype=jnp.float32))
    return RansacResult(H=A_out, inliers=inliers,
                        num_inliers=num.astype(jnp.int32), ok=ok)
