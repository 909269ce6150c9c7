"""Homography estimation kernels: normalized DLT, exact 4-point solve,
reprojection error, and Levenberg–Marquardt refinement.

TPU-native reconstruction of the numerics in ref 计算单应性矩阵.cpp:
- normalized DLT via 9x9 LtL eigendecomposition  (runKernel :304-373)
- reprojection error                              (computeError :383-402)
- analytic-Jacobian 8-parameter LM refinement     (HomographyRefineCallback
  :404-459, LMSolverImpl1 :461-591)

All functions are pure, mask-aware (fixed-capacity padded point sets), and
batchable with vmap — the RANSAC engine vmaps `solve_h4p` over thousands of
minimal samples in one dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Map (N, 2) points through a 3x3 homography (perspective divide).

    Guards the divide with a tiny epsilon of matching sign so padded/degenerate
    points yield finite garbage that downstream masks discard.
    """
    ones = jnp.ones_like(pts[..., :1])
    p = jnp.concatenate([pts, ones], axis=-1)  # (N, 3)
    q = p @ H.T
    w = q[..., 2:3]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return q[..., :2] / w


def reproj_error_sq(H: jnp.ndarray, src: jnp.ndarray,
                    dst: jnp.ndarray) -> jnp.ndarray:
    """Squared reprojection error per point (ref computeError :383-402).

    Matches the reference exactly: err_i = |H·src_i/w - dst_i|² computed in
    float32 (the reference stores float)."""
    proj = apply_homography(H, src)
    d = proj - dst
    return jnp.sum(d * d, axis=-1)


def _normalization(pts: jnp.ndarray, mask: jnp.ndarray):
    """L1 point normalization of the reference DLT (ref :319-343): translate
    to the centroid, scale by the inverse mean absolute deviation per axis."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    c = jnp.sum(pts * m[:, None], axis=0) / n
    d = jnp.abs(pts - c) * m[:, None]
    mad = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(mad, 1e-12)
    return c, s


def dlt_homography(src: jnp.ndarray, dst: jnp.ndarray,
                   mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized DLT over a masked point set (ref runKernel :304-373).

    src, dst: (N, 2) float32; mask: (N,) bool. Returns (H, ok) with H scaled
    so H[2,2] = 1 (as the reference's findHomography2 does before returning).

    Accumulates the 9x9 normal matrix LtL = Σ LxᵀLx + LyᵀLy over valid points
    and takes the eigenvector of the smallest eigenvalue (the reference calls
    completeSymm + cv::eigen; here one symmetric eigh). The accumulation is a
    (N,9)ᵀ(N,9) matmul — MXU-friendly.
    """
    m = mask.astype(jnp.float32)
    # sanitize masked-out rows: NaN/inf padding would otherwise poison the
    # masked accumulations below (NaN * 0 == NaN)
    src = jnp.where(mask[:, None], src, 0.0)
    dst = jnp.where(mask[:, None], dst, 0.0)
    cM, sM = _normalization(src, mask)   # src normalization (ref cM/sM)
    cm, sm = _normalization(dst, mask)   # dst normalization (ref cm/sm)

    X = (src[:, 0] - cM[0]) * sM[0]
    Y = (src[:, 1] - cM[1]) * sM[1]
    x = (dst[:, 0] - cm[0]) * sm[0]
    y = (dst[:, 1] - cm[1]) * sm[1]
    zeros = jnp.zeros_like(X)
    ones = jnp.ones_like(X)
    Lx = jnp.stack([X, Y, ones, zeros, zeros, zeros, -x * X, -x * Y, -x], 1)
    Ly = jnp.stack([zeros, zeros, zeros, X, Y, ones, -y * X, -y * Y, -y], 1)
    L = jnp.concatenate([Lx * m[:, None], Ly * m[:, None]], axis=0)  # (2N, 9)
    LtL = L.T @ L

    w, V = jnp.linalg.eigh(LtL)          # ascending eigenvalues
    h = V[:, 0]
    H0 = h.reshape(3, 3)

    # denormalize: H = T_dst⁻¹ · H0 · T_src  (ref :364-371)
    Tsrc = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    Tsrc = Tsrc.at[0, 0].set(sM[0]).at[1, 1].set(sM[1])
    Tsrc = Tsrc.at[0, 2].set(-cM[0] * sM[0]).at[1, 2].set(-cM[1] * sM[1])
    invTdst = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    invTdst = invTdst.at[0, 0].set(1.0 / sm[0]).at[1, 1].set(1.0 / sm[1])
    invTdst = invTdst.at[0, 2].set(cm[0]).at[1, 2].set(cm[1])
    H = invTdst @ H0 @ Tsrc

    scale = H[2, 2]
    ok = (jnp.abs(scale) > 1e-10) & jnp.all(jnp.isfinite(H)) & (jnp.sum(m) >= 4)
    H = H / jnp.where(ok, scale, 1.0)
    H = jnp.where(ok, H, jnp.eye(3, dtype=H.dtype))
    return H.astype(jnp.float32), ok


def _adjugate3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate of a 3x3 (adj(M) @ M = det(M)·I)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    return jnp.array([
        [e * i - f * h, c * h - b * i, b * f - c * e],
        [f * g - d * i, a * i - c * g, c * d - a * f],
        [d * h - e * g, b * g - a * h, a * e - b * d],
    ])


def _basis_to_quad(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 M mapping the projective basis (e1, e2, e3, [1,1,1]) to the four
    points q (4, 2): columns are the first three homogeneous points scaled so
    their sum is the fourth."""
    P = jnp.stack([jnp.append(q[0], 1.0), jnp.append(q[1], 1.0),
                   jnp.append(q[2], 1.0)], axis=1)        # (3, 3) columns
    p4 = jnp.append(q[3], 1.0)
    lam = _adjugate3(P) @ p4                               # solve P·λ = det·p4
    return P * lam[None, :]


def solve_h4p(src4: jnp.ndarray, dst4: jnp.ndarray):
    """Exact homography from 4 correspondences, fully closed-form.

    The minimal-sample kernel of the RANSAC engine (replacing the reference's
    per-iteration runKernel, ref run() :139-248). Instead of an 8x8 LU solve
    (batched LAPACK-style solves are slow on TPU), use the projective-basis
    construction: H = M_dst · adj(M_src), where M maps the projective basis
    to the quadrilateral — nothing but 3x3 determinant arithmetic, so 2048
    vmapped hypotheses are pure fused VPU work.

    src4, dst4: (4, 2). Returns (H, ok).
    """
    # normalize each quad to O(1) coordinates first: the basis construction
    # multiplies three levels of 3x3 products, which overflows float32 for
    # pixel-scale inputs and costs precision regardless
    def norm_T(q):
        c = jnp.mean(q, axis=0)
        s = 1.0 / jnp.maximum(jnp.mean(jnp.abs(q - c)), 1e-12)
        T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        T = T.at[0, 0].set(s).at[1, 1].set(s)
        T = T.at[0, 2].set(-c[0] * s).at[1, 2].set(-c[1] * s)
        return (q - c) * s, T

    src_n, Tsrc = norm_T(src4)
    dst_n, Tdst = norm_T(dst4)
    Ms = _basis_to_quad(src_n)
    Md = _basis_to_quad(dst_n)
    Hn = Md @ _adjugate3(Ms)                               # Md · Ms⁻¹ · det
    invTdst = _adjugate3(Tdst)                             # affine: adj ∝ inv
    H = invTdst @ Hn @ Tsrc
    scale = H[2, 2]
    ok = jnp.all(jnp.isfinite(H)) & (jnp.abs(scale) > 1e-20)
    H = H / jnp.where(ok, scale, 1.0)
    H = jnp.where(ok, H, jnp.eye(3, dtype=H.dtype))
    return H.astype(jnp.float32), ok


def _lm_jacobian_residual(h8: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                          mask: jnp.ndarray):
    """Residuals r (2N,) and analytic Jacobian J (2N, 8) of the 8-parameter
    homography (h22 ≡ 1), exactly the reference's HomographyRefineCallback
    (ref :413-456). Masked rows are zeroed (they contribute nothing to JᵀJ);
    masked inputs are sanitized first so NaN padding cannot poison JᵀJ."""
    src = jnp.where(mask[:, None], src, 0.0)
    dst = jnp.where(mask[:, None], dst, 0.0)
    Mx, My = src[:, 0], src[:, 1]
    h = h8
    w = h[6] * Mx + h[7] * My + 1.0
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    ww = 1.0 / w
    xi = (h[0] * Mx + h[1] * My + h[2]) * ww
    yi = (h[3] * Mx + h[4] * My + h[5]) * ww
    m = mask.astype(jnp.float32)
    rx = (xi - dst[:, 0]) * m
    ry = (yi - dst[:, 1]) * m
    zeros = jnp.zeros_like(Mx)
    Jx = jnp.stack([Mx * ww, My * ww, ww, zeros, zeros, zeros,
                    -Mx * ww * xi, -My * ww * xi], 1) * m[:, None]
    Jy = jnp.stack([zeros, zeros, zeros, Mx * ww, My * ww, ww,
                    -Mx * ww * yi, -My * ww * yi], 1) * m[:, None]
    r = jnp.concatenate([rx, ry])
    J = jnp.concatenate([Jx, Jy], axis=0)
    return r, J


def lm_refine_homography(H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                         mask: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Levenberg–Marquardt refinement of H over masked correspondences.

    Fixed-iteration reconstruction of ref LMSolverImpl1::run (:473-591):
    damped normal equations (A + λ·diag A)·dx = Jᵀr with multiplicative λ
    adaptation and step acceptance — expressed as a lax.fori_loop so the
    whole refinement stays on device.
    """
    h0 = (H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1.0)).reshape(-1)[:8]

    def err_of(h8):
        r, _ = _lm_jacobian_residual(h8, src, dst, mask)
        return jnp.sum(r * r)

    def body(_, state):
        h8, lam, err = state
        r, J = _lm_jacobian_residual(h8, src, dst, mask)
        A = J.T @ J
        g = J.T @ r
        D = jnp.diag(jnp.maximum(jnp.diag(A), 1e-12))
        dx = jnp.linalg.solve(A + lam * D, g)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        h_try = h8 - dx
        err_try = err_of(h_try)
        accept = err_try < err
        h_new = jnp.where(accept, h_try, h8)
        lam_new = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam_new = jnp.clip(lam_new, 1e-12, 1e12)
        err_new = jnp.where(accept, err_try, err)
        return h_new, lam_new, err_new

    err0 = err_of(h0)
    hf, _, _ = lax.fori_loop(0, iters, body,
                             (h0, jnp.float32(1e-3), err0))
    Hf = jnp.concatenate([hf, jnp.ones((1,), hf.dtype)]).reshape(3, 3)
    return Hf.astype(jnp.float32)
