"""Ray-error bundle adjustment + wave correction.

The reference uses stock OpenCV for both: `BundleAdjusterRay` with
conf_thresh=1 (ref 特征点检测.cpp:1064-1067) and `waveCorrect` (present but
commented out, :1071-1077). This is the TPU-native equivalent: per-camera
(focal, Rodrigues rotation) parameters refined by Levenberg–Marquardt over
the ray-difference residuals of all inlier correspondences, with the whole
solver (residuals, Jacobian via jacfwd, damped normal equations) one jitted
function — the parameter vector is tiny (4 per camera) while the residual
set is large, exactly the shape LM-on-device likes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from imagestitch_tpu.types import CameraParams


def rodrigues_to_R(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from a Rodrigues vector (3,), small-angle safe."""
    theta2 = jnp.sum(r * r)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = r / theta
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]])
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    # near-zero angle: first-order expansion
    Rsmall = jnp.eye(3) + jnp.array([[0.0, -r[2], r[1]],
                                     [r[2], 0.0, -r[0]],
                                     [-r[1], r[0], 0.0]])
    return jnp.where(theta2 < 1e-12, Rsmall, R).astype(jnp.float32)


def R_to_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues vector from a rotation matrix (3, 3)."""
    tr = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(tr)
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = 2.0 * jnp.sin(theta)
    scale = jnp.where(jnp.abs(s) < 1e-8, 0.5, theta / jnp.where(
        jnp.abs(s) < 1e-8, 1.0, s))
    return (v * scale).astype(jnp.float32)


def _rays(params_i: jnp.ndarray, pts: jnp.ndarray, ppx, ppy) -> jnp.ndarray:
    """Unit rays of pixel points under camera params (focal, r3). (T, 3)."""
    f = params_i[0]
    R = rodrigues_to_R(params_i[1:4])
    x = (pts[:, 0] - ppx) / f
    y = (pts[:, 1] - ppy) / f
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # K^-1 p
    rays = d @ R.T
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


def _lm_minimize(residuals, x0: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Levenberg–Marquardt on a dense residual vector. Shared by the ray
    and reprojection adjusters: the parameter vector is tiny (4-7 per
    camera) while the residual set is large, so jacfwd + damped normal
    equations in one jitted while_loop is the right shape on TPU."""

    def err_of(x):
        r = residuals(x)
        return jnp.sum(r * r)

    jac = jax.jacfwd(residuals)

    def cond(state):
        i, x, lam, err, done = state
        return (i < iters) & jnp.logical_not(done)

    def body(state):
        i, x, lam, err, _ = state
        r = residuals(x)
        J = jac(x)                                                # (M, P)
        A = J.T @ J
        g = J.T @ r
        D = jnp.diag(jnp.maximum(jnp.diag(A), 1e-8))
        dx = jnp.linalg.solve(A + lam * D, g)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        x_try = x - dx
        e_try = err_of(x_try)
        accept = e_try < err
        # converged: an accepted step improved the error by < 1e-6 relative,
        # or damping has blown up (no direction helps)
        done = (accept & (err - e_try < 1e-6 * (err + 1e-20))) | (lam > 1e8)
        return (i + 1,
                jnp.where(accept, x_try, x),
                jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                         1e-10, 1e10),
                jnp.where(accept, e_try, err),
                done)

    _, xf, _, _, _ = lax.while_loop(
        cond, body,
        (jnp.int32(0), x0, jnp.float32(1e-3), err_of(x0), jnp.bool_(False)))
    return xf


def bundle_adjust_ray(cameras: CameraParams,
                      src_pts: jnp.ndarray, dst_pts: jnp.ndarray,
                      pt_valid: jnp.ndarray,
                      pair_from: jnp.ndarray, pair_to: jnp.ndarray,
                      pair_valid: jnp.ndarray,
                      iters: int = 25) -> CameraParams:
    """Refine focals + rotations by minimizing ray differences.

    src_pts/dst_pts: (P, T, 2) pixel coordinates of inlier correspondences
    per pair (padded to T); pt_valid: (P, T) bool; pair_from/to: (P,) int32;
    pair_valid: (P,) bool (confidence > conf_thresh pairs only, as the
    reference driver passes to BundleAdjusterRay).

    Residual per correspondence: sqrt(f_i·f_j) · (ray_i − ray_j), three
    components, matching OpenCV's BundleAdjusterRay error metric.
    """
    N = cameras.focal.shape[0]
    r0 = jax.vmap(R_to_rodrigues)(cameras.R)                     # (N, 3)
    x0 = jnp.concatenate([cameras.focal[:, None], r0], axis=1).reshape(-1)

    ppx, ppy = cameras.ppx, cameras.ppy
    m = (pt_valid & pair_valid[:, None]).astype(jnp.float32)      # (P, T)

    def residuals(x):
        p = x.reshape(N, 4)
        fi = p[pair_from, 0]
        fj = p[pair_to, 0]
        scale = jnp.sqrt(jnp.abs(fi * fj))[:, None, None]         # (P,1,1)
        rays_i = jax.vmap(
            lambda pf, pts: _rays(p[pf], pts, ppx[pf], ppy[pf]),
            in_axes=(0, 0))(pair_from, src_pts)                   # (P, T, 3)
        rays_j = jax.vmap(
            lambda pt_, pts: _rays(p[pt_], pts, ppx[pt_], ppy[pt_]),
            in_axes=(0, 0))(pair_to, dst_pts)
        r = (rays_i - rays_j) * scale * m[..., None]
        return r.reshape(-1)

    xf = _lm_minimize(residuals, x0, iters)
    pf = xf.reshape(N, 4)
    Rf = jax.vmap(rodrigues_to_R)(pf[:, 1:4])
    # Gauge fix: the ray residuals are invariant under a global rotation, so
    # LM can drift all cameras by a common roll/pan. Re-anchor camera 0 to
    # its pre-BA orientation: R_i <- R0_init · R0_baᵀ · R_i.
    G = cameras.R[0] @ Rf[0].T
    Rf = jnp.einsum("ab,nbc->nac", G, Rf)
    return cameras.replace(focal=jnp.abs(pf[:, 0]), R=Rf)


def bundle_adjust_reproj(cameras: CameraParams,
                         src_pts: jnp.ndarray, dst_pts: jnp.ndarray,
                         pt_valid: jnp.ndarray,
                         pair_from: jnp.ndarray, pair_to: jnp.ndarray,
                         pair_valid: jnp.ndarray,
                         iters: int = 25) -> CameraParams:
    """Refine cameras by minimizing pixel reprojection error (OpenCV's
    BundleAdjusterReproj, the alternative to the reference driver's
    BundleAdjusterRay, ref 特征点检测.cpp:1064).

    Same input contract as bundle_adjust_ray. Per-camera parameters follow
    OpenCV's 7: (focal, ppx, ppy, aspect, 3-vector Rodrigues rotation).
    Residual per correspondence (p in image i, q in image j), 2 components:

        proj( K_j · R_jᵀ · R_i · K_i⁻¹ · [p, 1] ) − q

    (the rotation-only transfer map between the two pinhole cameras; like
    the ray error it is invariant under a global rotation, so camera 0 is
    re-anchored after the solve).
    """
    N = cameras.focal.shape[0]
    r0 = jax.vmap(R_to_rodrigues)(cameras.R)                     # (N, 3)
    x0 = jnp.concatenate([cameras.focal[:, None],
                          cameras.ppx[:, None], cameras.ppy[:, None],
                          cameras.aspect[:, None], r0], axis=1).reshape(-1)
    m = (pt_valid & pair_valid[:, None]).astype(jnp.float32)     # (P, T)

    def transfer(params_i, params_j, pts):
        """Map pixels of camera i into camera j. pts: (T, 2) -> (T, 2)."""
        fi, pxi, pyi, ai = params_i[0], params_i[1], params_i[2], params_i[3]
        fj, pxj, pyj, aj = params_j[0], params_j[1], params_j[2], params_j[3]
        Ri = rodrigues_to_R(params_i[4:7])
        Rj = rodrigues_to_R(params_j[4:7])
        # K_i^{-1} p
        x = (pts[:, 0] - pxi) / fi
        y = (pts[:, 1] - pyi) / (fi * ai)
        d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        w = (d @ Ri.T) @ Rj                                      # R_jᵀ R_i d
        z = jnp.where(jnp.abs(w[:, 2]) < 1e-8, 1e-8, w[:, 2])
        u = fj * w[:, 0] / z + pxj
        v = fj * aj * w[:, 1] / z + pyj
        return jnp.stack([u, v], axis=-1)

    def residuals(x):
        p = x.reshape(N, 7)
        pred = jax.vmap(
            lambda pf_, pt_, pts: transfer(p[pf_], p[pt_], pts),
            in_axes=(0, 0, 0))(pair_from, pair_to, src_pts)      # (P, T, 2)
        r = (pred - dst_pts) * m[..., None]
        return r.reshape(-1)

    xf = _lm_minimize(residuals, x0, iters)
    pf = xf.reshape(N, 7)
    Rf = jax.vmap(rodrigues_to_R)(pf[:, 4:7])
    G = cameras.R[0] @ Rf[0].T
    Rf = jnp.einsum("ab,nbc->nac", G, Rf)
    return cameras.replace(focal=jnp.abs(pf[:, 0]), ppx=pf[:, 1],
                           ppy=pf[:, 2], aspect=jnp.abs(pf[:, 3]), R=Rf)


def bundle_adjust(cameras: CameraParams,
                  src_pts: jnp.ndarray, dst_pts: jnp.ndarray,
                  pt_valid: jnp.ndarray,
                  pair_from: jnp.ndarray, pair_to: jnp.ndarray,
                  pair_valid: jnp.ndarray,
                  iters: int = 25, kind: str = "ray") -> CameraParams:
    """Bundle-adjuster dispatch: kind = "ray" (the reference driver's
    BundleAdjusterRay) or "reproj" (OpenCV's BundleAdjusterReproj)."""
    fn = {"ray": bundle_adjust_ray, "reproj": bundle_adjust_reproj}[kind]
    return fn(cameras, src_pts, dst_pts, pt_valid,
              pair_from, pair_to, pair_valid, iters)


def bundle_adjust_affine(Gs, src_pts, dst_pts, pt_valid,
                         pair_from, pair_to, pair_valid,
                         anchor: int = 0, partial: bool = True):
    """Joint affine bundle adjustment (OpenCV BundleAdjusterAffinePartial /
    BundleAdjusterAffine, the SCANS-mode refiners) — host NumPy.

    The residual of a correspondence (x in image u, y in image v) under
    global transforms is G_u·[x,1] − G_v·[y,1], which is LINEAR in every
    transform's entries — so unlike OpenCV's iterative LM, the joint
    optimum is ONE least-squares solve of the normal equations (4 unknowns
    per camera for the partial/similarity model, 6 for full affine), with
    the anchor camera's transform pinned as the gauge (a global affine
    would otherwise shrink all residuals toward zero).

    Gs: (N, 3, 3) chained initial transforms (the anchor's is kept; the
    rest also serve as the prior for cameras with no constraints).
    src_pts/dst_pts: (P, T, 2); pt_valid: (P, T) bool; pair_from/to: (P,);
    pair_valid: (P,) bool. Returns the refined (N, 3, 3) float32.
    """
    import numpy as np

    Gs = np.asarray(Gs, np.float64)
    N = Gs.shape[0]
    k = 4 if partial else 6

    def params_of(G):
        if partial:
            return np.array([G[0, 0], G[1, 0], G[0, 2], G[1, 2]])
        return np.array([G[0, 0], G[0, 1], G[0, 2],
                         G[1, 0], G[1, 1], G[1, 2]])

    def G_of(p):
        if partial:
            a, b, tx, ty = p
            return np.array([[a, -b, tx], [b, a, ty], [0, 0, 1.0]])
        return np.array([[p[0], p[1], p[2]], [p[3], p[4], p[5]],
                         [0, 0, 1.0]])

    def rows(pts):
        """Coefficient rows (T, 2, k): residual rows 1/2 as functions of a
        camera's params, evaluated at its own points."""
        x, y = pts[:, 0], pts[:, 1]
        one = np.ones_like(x)
        zero = np.zeros_like(x)
        if partial:
            r1 = np.stack([x, -y, one, zero], 1)
            r2 = np.stack([y, x, zero, one], 1)
        else:
            r1 = np.stack([x, y, one, zero, zero, zero], 1)
            r2 = np.stack([zero, zero, zero, x, y, one], 1)
        return np.stack([r1, r2], 1)                  # (T, 2, k)

    M = np.zeros((k * N, k * N))
    for p in range(src_pts.shape[0]):
        if not bool(pair_valid[p]):
            continue
        w = np.asarray(pt_valid[p], np.float64)
        if w.sum() < 2:
            continue
        u, v = int(pair_from[p]), int(pair_to[p])
        Cu = rows(np.asarray(src_pts[p], np.float64))  # (T, 2, k)
        Cv = rows(np.asarray(dst_pts[p], np.float64))
        Cu_w = Cu * w[:, None, None]
        # Σ_t Σ_r Cuᵀ Cu etc., accumulated into the camera blocks
        uu = np.einsum("trk,trl->kl", Cu_w, Cu)
        uv = np.einsum("trk,trl->kl", Cu_w, Cv)
        vv = np.einsum("trk,trl->kl", Cv * w[:, None, None], Cv)
        su, sv = slice(k * u, k * u + k), slice(k * v, k * v + k)
        M[su, su] += uu
        M[sv, sv] += vv
        M[su, sv] -= uv
        M[sv, su] -= uv.T

    # prior pulling every camera toward its chained initial params: keeps
    # unconstrained (unreached) cameras in place and conditions the solve
    p0 = np.concatenate([params_of(Gs[i]) for i in range(N)])
    lam = 1e-6 * max(np.trace(M) / max(k * N, 1), 1.0)
    M += lam * np.eye(k * N)
    b = lam * p0.copy()

    # gauge: pin the anchor by moving its (known) params to the RHS
    free = np.ones(k * N, bool)
    free[k * anchor:k * anchor + k] = False
    pa = params_of(Gs[anchor])
    b_free = b[free] - M[np.ix_(free, ~free)] @ pa
    sol = np.linalg.solve(M[np.ix_(free, free)], b_free)

    p_all = np.empty(k * N)
    p_all[~free] = pa
    p_all[free] = sol
    out = np.stack([G_of(p_all[k * i:k * i + k]) for i in range(N)])
    return out.astype(np.float32)


def wave_correct(R: jnp.ndarray, kind: str = "horiz") -> jnp.ndarray:
    """Straighten the panorama horizon (OpenCV detail::waveCorrect; present
    but commented out in the reference driver, 特征点检测.cpp:1071-1077).

    R: (N, 3, 3). Returns the globally-rotated (N, 3, 3).
    """
    x_axes = R[:, :, 0]                                           # (N, 3)
    moment = x_axes.T @ x_axes                                    # (3, 3)
    _, V = jnp.linalg.eigh(moment)
    # OpenCV motion_estimators.cpp: HORIZ anchors rg1 to the SMALLEST-
    # eigenvalue direction of the x-axis moment (the pan axis is the one
    # the camera x-axes avoid); VERT to the LARGEST (the camera sweeps
    # vertically, so the x-axes cluster around the global x)
    rg1 = V[:, 0] if kind == "horiz" else V[:, 2]
    img_k = jnp.sum(R[:, :, 2], axis=0)
    rg0 = jnp.cross(rg1, img_k)
    rg0 = rg0 / jnp.maximum(jnp.linalg.norm(rg0), 1e-12)
    rg2 = jnp.cross(rg0, rg1)

    if kind == "horiz":
        conf = jnp.sum(x_axes @ rg0)
    else:                                  # vert: conf = -Σ rg1·x_i
        conf = -jnp.sum(x_axes @ rg1)
    sign = jnp.where(conf < 0, -1.0, 1.0)
    rg0 = rg0 * sign
    rg1 = rg1 * sign
    G = jnp.stack([rg0, rg1, rg2], axis=0)                        # rows
    return jnp.einsum("ab,nbc->nac", G, R).astype(jnp.float32)
