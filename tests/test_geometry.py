"""Geometry-core tests: DLT/4-point solvers against synthetic ground-truth
homographies, LM refinement convergence, RANSAC outlier rejection, focal
recovery, rotation utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagestitch_tpu.config import RansacConfig
from imagestitch_tpu.geometry import (
    apply_homography, dlt_homography, solve_h4p, reproj_error_sq,
    lm_refine_homography, find_homography, focals_from_homography,
    estimate_focal, max_spanning_tree, estimate_cameras,
    estimate_cameras_host, bundle_adjust_ray, wave_correct,
)
from imagestitch_tpu.geometry.bundle import rodrigues_to_R, R_to_rodrigues


def random_h(rng, scale=1.0):
    """A well-conditioned random homography."""
    H = np.eye(3) + rng.normal(0, 0.1, (3, 3)) * np.array(
        [[0.3, 0.3, 30 * scale], [0.3, 0.3, 30 * scale], [1e-3, 1e-3, 0.3]])
    return H / H[2, 2]


def project(H, pts):
    p = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ H.T
    return p[:, :2] / p[:, 2:3]


def test_apply_homography_identity():
    pts = jnp.asarray(np.random.default_rng(0).uniform(-100, 100, (10, 2)),
                      jnp.float32)
    out = apply_homography(jnp.eye(3), pts)
    assert np.allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_solve_h4p_exact():
    rng = np.random.default_rng(3)
    H = random_h(rng)
    src = rng.uniform(-200, 200, (4, 2)).astype(np.float32)
    dst = project(H, src).astype(np.float32)
    Hj, ok = solve_h4p(jnp.asarray(src), jnp.asarray(dst))
    assert bool(ok)
    Hj = np.asarray(Hj)
    assert np.allclose(Hj / Hj[2, 2], H, atol=1e-2)
    err = np.asarray(reproj_error_sq(jnp.asarray(Hj), jnp.asarray(src),
                                     jnp.asarray(dst)))
    assert err.max() < 1e-3


def test_dlt_recovers_h_masked():
    rng = np.random.default_rng(4)
    H = random_h(rng)
    src = rng.uniform(-300, 300, (64, 2)).astype(np.float32)
    dst = project(H, src).astype(np.float32)
    # pad with garbage that the mask must ignore
    mask = np.ones(64, bool)
    mask[40:] = False
    dst[40:] = rng.uniform(-1e4, 1e4, (24, 2))
    Hj, ok = dlt_homography(jnp.asarray(src), jnp.asarray(dst),
                            jnp.asarray(mask))
    assert bool(ok)
    err = np.asarray(reproj_error_sq(Hj, jnp.asarray(src), jnp.asarray(dst)))
    assert err[mask].max() < 1e-2


def test_dlt_too_few_points_not_ok():
    src = jnp.zeros((8, 2))
    dst = jnp.zeros((8, 2))
    mask = jnp.zeros((8,), bool).at[0].set(True)
    _, ok = dlt_homography(src, dst, mask)
    assert not bool(ok)


def test_lm_refine_improves_noisy_h():
    rng = np.random.default_rng(5)
    H = random_h(rng)
    src = rng.uniform(-300, 300, (100, 2)).astype(np.float32)
    dst = project(H, src).astype(np.float32)
    H_noisy = H + rng.normal(0, 1e-3, (3, 3)) * np.array(
        [[1, 1, 10], [1, 1, 10], [1e-4, 1e-4, 0]])
    mask = jnp.ones((100,), bool)
    e0 = float(np.asarray(reproj_error_sq(
        jnp.asarray(H_noisy, jnp.float32), jnp.asarray(src),
        jnp.asarray(dst))).sum())
    Hr = lm_refine_homography(jnp.asarray(H_noisy, jnp.float32),
                              jnp.asarray(src), jnp.asarray(dst), mask, 10)
    e1 = float(np.asarray(reproj_error_sq(Hr, jnp.asarray(src),
                                          jnp.asarray(dst))).sum())
    assert e1 < e0 * 0.5


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(6)
    H = random_h(rng)
    N = 256
    src = rng.uniform(-300, 300, (N, 2)).astype(np.float32)
    dst = project(H, src).astype(np.float32)
    dst += rng.normal(0, 0.3, dst.shape)  # inlier noise
    n_out = 80
    out_idx = rng.choice(N, n_out, replace=False)
    dst[out_idx] += rng.uniform(50, 400, (n_out, 2)) * rng.choice(
        [-1, 1], (n_out, 2))
    mask = np.ones(N, bool)
    mask[200:] = False  # padding (also contains some outliers — fine)

    res = find_homography(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(mask), jax.random.key(0),
                          RansacConfig(num_hypotheses=512))
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    # every found inlier really is within threshold of the true model
    true_err = np.linalg.norm(project(H, src) - dst, axis=1)
    assert (true_err[inl] < 6.0).all()
    # and most true inliers were found
    true_inl = (true_err < 2.0) & mask
    assert inl[true_inl].mean() > 0.8
    Hf = np.asarray(res.H)
    assert np.allclose(Hf / Hf[2, 2], H, atol=0.2)


def test_ransac_deterministic():
    rng = np.random.default_rng(7)
    H = random_h(rng)
    src = rng.uniform(-200, 200, (64, 2)).astype(np.float32)
    dst = project(H, src).astype(np.float32)
    mask = jnp.ones((64,), bool)
    cfg = RansacConfig(num_hypotheses=256)
    r1 = find_homography(jnp.asarray(src), jnp.asarray(dst), mask,
                         jax.random.key(42), cfg)
    r2 = find_homography(jnp.asarray(src), jnp.asarray(dst), mask,
                         jax.random.key(42), cfg)
    assert np.array_equal(np.asarray(r1.H), np.asarray(r2.H))


def _rotation_y(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def make_rotation_pair_h(focal=800.0, angle=0.15):
    """H between two cameras differing by a pure y-rotation (the panorama
    model): H = K R K^-1 maps cam0 center-normalized pixels to cam1."""
    K = np.diag([focal, focal, 1.0])
    R = _rotation_y(angle)
    H = K @ R @ np.linalg.inv(K)
    return H / H[2, 2], K, R


def test_focals_from_homography_rotation_model():
    H, K, R = make_rotation_pair_h(800.0, 0.2)
    f0, f1, ok0, ok1 = focals_from_homography(jnp.asarray(H, jnp.float32))
    assert bool(ok0) and bool(ok1)
    assert abs(float(f0) - 800.0) / 800.0 < 0.05
    assert abs(float(f1) - 800.0) / 800.0 < 0.05


def test_estimate_focal_median_and_fallback():
    H, _, _ = make_rotation_pair_h(650.0, 0.12)
    Hs = jnp.asarray(np.stack([H, H, H]), jnp.float32)
    sizes = jnp.asarray([[480, 640]] * 4, jnp.int32)
    f = float(estimate_focal(Hs, jnp.ones(3, bool), sizes, 4))
    assert abs(f - 650.0) / 650.0 < 0.05
    # all pairs invalid -> image-size fallback
    f2 = float(estimate_focal(Hs, jnp.zeros(3, bool), sizes, 4))
    assert f2 == pytest.approx(480 + 640)


def test_max_spanning_tree_chain():
    # 4 images, chain weights favor 0-1-2-3
    pf = np.array([0, 1, 2, 0])
    pt = np.array([1, 2, 3, 3])
    w = np.array([100, 90, 80, 1])
    edges, center, reachable = max_spanning_tree(4, pf, pt, w)
    assert len(edges) == 3
    assert center in (1, 2)
    reached = {center} | {v for _, v in edges}
    assert reached == {0, 1, 2, 3}
    assert reachable.all()


def test_max_spanning_tree_disconnected_component():
    """An image with no confident pair must be OUTSIDE the reachable set
    and must not hijack the center (its BFS max-depth is trivially 0 —
    leaveBiggestComponent semantics, like the OpenCV driver)."""
    # 4 images; image 2 has no valid pair at all
    pf = np.array([0, 1])
    pt = np.array([1, 3])
    w = np.array([100, 90])
    edges, center, reachable = max_spanning_tree(4, pf, pt, w)
    assert list(reachable) == [True, True, False, True]
    assert center in (0, 1, 3)
    reached = {center} | {v for _, v in edges}
    assert reached == {0, 1, 3}


def test_estimate_cameras_chain_rotation():
    H, K, R = make_rotation_pair_h(700.0, 0.1)
    Hs = jnp.asarray(H[None], jnp.float32)
    sizes = jnp.asarray([[480, 640], [480, 640]], jnp.int32)
    cams = estimate_cameras(Hs, jnp.ones(1, bool), sizes)
    assert abs(float(cams.focal[0]) - 700.0) / 700.0 < 0.05
    # R1 should equal inv of the relative rotation (up to estimation error):
    # R_to = R_from * K^-1 H^-1 K = R^-1 for H = K R K^-1
    R1 = np.asarray(cams.R[1])
    assert np.allclose(R1, R.T, atol=0.05)
    assert float(cams.ppx[0]) == 320.0 and float(cams.ppy[0]) == 240.0


def test_estimate_cameras_host_matches_chain():
    H, K, R = make_rotation_pair_h(700.0, 0.1)
    sizes = np.array([[480, 640], [480, 640]])
    cams = estimate_cameras_host(
        np.asarray(H)[None], np.array([0]), np.array([1]),
        np.array([50]), np.array([True]), sizes)
    cams_chain = estimate_cameras(jnp.asarray(H[None], jnp.float32),
                                  jnp.ones(1, bool), jnp.asarray(sizes))
    assert np.allclose(np.asarray(cams.R), np.asarray(cams_chain.R), atol=1e-3)
    assert np.allclose(float(cams.focal[0]), float(cams_chain.focal[0]),
                       rtol=1e-3)


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(8)
    for _ in range(5):
        r = rng.normal(0, 1, 3).astype(np.float32)
        R = rodrigues_to_R(jnp.asarray(r))
        r2 = np.asarray(R_to_rodrigues(R))
        R2 = np.asarray(rodrigues_to_R(jnp.asarray(r2)))
        assert np.allclose(np.asarray(R), R2, atol=1e-4)
    # identity
    assert np.allclose(np.asarray(rodrigues_to_R(jnp.zeros(3))), np.eye(3),
                       atol=1e-6)


def test_bundle_adjust_reduces_ray_error():
    # two cameras with a known relative y-rotation; perturb the initial
    # rotation and check BA pulls the ray residuals down
    rng = np.random.default_rng(9)
    focal = 600.0
    Rtrue = _rotation_y(0.12)
    K = np.diag([focal, focal, 1.0])
    # points visible in both (generate in cam0 pixels, map into cam1 pixels)
    pts0 = rng.uniform(-200, 200, (64, 2))
    H = K @ Rtrue @ np.linalg.inv(K)

    def proj(H, p):
        q = np.concatenate([p, np.ones((len(p), 1))], 1) @ H.T
        return q[:, :2] / q[:, 2:3]

    pts1 = proj(np.linalg.inv(H), pts0)  # cam1 pixel coords of same rays

    from imagestitch_tpu.types import CameraParams
    R_init = np.stack([np.eye(3), _rotation_y(0.10)])  # perturbed
    cams = CameraParams(
        focal=jnp.full((2,), focal * 1.06, jnp.float32),
        aspect=jnp.ones((2,), jnp.float32),
        ppx=jnp.zeros((2,), jnp.float32), ppy=jnp.zeros((2,), jnp.float32),
        R=jnp.asarray(R_init, jnp.float32), t=jnp.zeros((2, 3), jnp.float32))

    src = jnp.asarray(pts0[None], jnp.float32)
    dst = jnp.asarray(pts1[None], jnp.float32)
    ptv = jnp.ones((1, 64), bool)
    out = bundle_adjust_ray(cams, src, dst, ptv,
                            jnp.asarray([0]), jnp.asarray([1]),
                            jnp.ones(1, bool), iters=30)
    # with pts1 = (K Rtrue^T K^-1) pts0 and ray_i = R_i K^-1 p_i, equal rays
    # require R1 = Rtrue (R0 = I)
    R_rel = np.asarray(out.R[0]).T @ np.asarray(out.R[1])
    assert np.allclose(R_rel, Rtrue, atol=2e-2)
    assert abs(float(out.focal[0]) - focal) / focal < 0.05


def test_bundle_adjust_reproj_recovers_cameras():
    """Same two-camera fixture as the ray test through the reprojection
    adjuster (OpenCV BundleAdjusterReproj): the relative rotation and the
    focal must be recovered from perturbed initial cameras by minimizing
    pixel transfer error (7 params/camera: f, ppx, ppy, aspect, Rodrigues)."""
    from imagestitch_tpu.geometry.bundle import bundle_adjust_reproj

    rng = np.random.default_rng(9)
    focal = 600.0
    Rtrue = _rotation_y(0.12)
    K = np.diag([focal, focal, 1.0])
    pts0 = rng.uniform(-200, 200, (64, 2))
    H = K @ Rtrue @ np.linalg.inv(K)

    def proj(H, p):
        q = np.concatenate([p, np.ones((len(p), 1))], 1) @ H.T
        return q[:, :2] / q[:, 2:3]

    pts1 = proj(np.linalg.inv(H), pts0)

    from imagestitch_tpu.types import CameraParams
    R_init = np.stack([np.eye(3), _rotation_y(0.10)])
    cams = CameraParams(
        focal=jnp.full((2,), focal * 1.06, jnp.float32),
        aspect=jnp.ones((2,), jnp.float32),
        ppx=jnp.zeros((2,), jnp.float32), ppy=jnp.zeros((2,), jnp.float32),
        R=jnp.asarray(R_init, jnp.float32), t=jnp.zeros((2, 3), jnp.float32))

    out = bundle_adjust_reproj(
        cams, jnp.asarray(pts0[None], jnp.float32),
        jnp.asarray(pts1[None], jnp.float32), jnp.ones((1, 64), bool),
        jnp.asarray([0]), jnp.asarray([1]), jnp.ones(1, bool), iters=40)
    R_rel = np.asarray(out.R[0]).T @ np.asarray(out.R[1])
    assert np.allclose(R_rel, Rtrue, atol=2e-2)
    # the residual transfer error must be ~zero after refinement
    f0, f1v = float(out.focal[0]), float(out.focal[1])
    K0 = np.diag([f0, f0 * float(out.aspect[0]), 1.0])
    K0[0, 2], K0[1, 2] = float(out.ppx[0]), float(out.ppy[0])
    K1 = np.diag([f1v, f1v * float(out.aspect[1]), 1.0])
    K1[0, 2], K1[1, 2] = float(out.ppx[1]), float(out.ppy[1])
    M = K1 @ np.asarray(out.R[1]).T @ np.asarray(out.R[0]) \
        @ np.linalg.inv(K0)
    err = np.abs(proj(M, pts0) - pts1).max()
    assert err < 0.5


def test_affine_solvers_exact_on_clean_points():
    """Minimal solves and the LS refit recover exact transforms from
    noise-free correspondences (both motion models)."""
    from imagestitch_tpu.geometry.affine import (
        solve_affine_partial_2p, solve_affine_3p, ls_affine,
        affine_error_sq)

    th, s = 0.3, 1.2
    A_sim = np.array([[s * np.cos(th), -s * np.sin(th), 12.0],
                      [s * np.sin(th), s * np.cos(th), -7.0],
                      [0, 0, 1]], np.float32)
    A_full = np.array([[1.1, 0.2, 5.0], [-0.15, 0.9, 3.0], [0, 0, 1]],
                      np.float32)
    rng = np.random.default_rng(1)
    src = rng.uniform(-100, 100, (16, 2)).astype(np.float32)

    def apply(A, p):
        return p @ A[:2, :2].T + A[:2, 2]

    A2, ok2 = solve_affine_partial_2p(jnp.asarray(src[:2]),
                                      jnp.asarray(apply(A_sim, src[:2])))
    assert bool(ok2)
    assert np.abs(np.asarray(A2) - A_sim).max() < 1e-4

    A3, ok3 = solve_affine_3p(jnp.asarray(src[:3]),
                              jnp.asarray(apply(A_full, src[:3])))
    assert bool(ok3)
    assert np.abs(np.asarray(A3) - A_full).max() < 1e-4

    for A_true, partial in ((A_sim, True), (A_full, False)):
        dst = apply(A_true, src)
        Af, okf = ls_affine(jnp.asarray(src), jnp.asarray(dst),
                            jnp.ones((16,), jnp.float32), partial)
        assert bool(okf)
        err = np.asarray(affine_error_sq(Af, jnp.asarray(src),
                                         jnp.asarray(dst)))
        assert err.max() < 1e-4


def test_find_affine_rejects_outliers():
    """RANSAC affine on 50% outliers recovers the transform (both
    models); deterministic given the key."""
    from imagestitch_tpu.geometry.affine import find_affine

    rng = np.random.default_rng(0)
    n = 256
    src = rng.uniform(0, 500, (n, 2)).astype(np.float32)
    th, s = 0.2, 1.15
    A_true = np.array([[s * np.cos(th), -s * np.sin(th), 40.0],
                       [s * np.sin(th), s * np.cos(th), -25.0]], np.float32)
    dst = (src @ A_true[:, :2].T + A_true[:, 2]).astype(np.float32)
    dst[n // 2:] += rng.uniform(-120, 120, (n - n // 2, 2)).astype(np.float32)
    mask = np.ones((n,), bool)

    for partial in (True, False):
        res = find_affine(jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(mask), jax.random.key(0),
                          partial=partial)
        assert bool(res.ok)
        assert int(res.num_inliers) >= n // 2 - 4
        A = np.asarray(res.H)[:2]
        assert np.abs(A - A_true).max() < 0.05
        res2 = find_affine(jnp.asarray(src), jnp.asarray(dst),
                           jnp.asarray(mask), jax.random.key(0),
                           partial=partial)
        assert np.array_equal(np.asarray(res.H), np.asarray(res2.H))


def test_bundle_adjust_affine_joint_ls():
    """The linear affine BA recovers ground-truth similarity transforms of
    3 cameras from noisy correspondences of ALL pairs, beating the
    chain-only initialization (which never sees the 0-2 skip pair)."""
    from imagestitch_tpu.geometry.bundle import bundle_adjust_affine

    rng = np.random.default_rng(4)

    def sim(th, s, tx, ty):
        c, sn = np.cos(th), np.sin(th)
        return np.array([[s * c, -s * sn, tx], [s * sn, s * c, ty],
                         [0, 0, 1.0]])

    # ground-truth globals (camera i pixels -> canvas), camera 0 = anchor
    G_true = [np.eye(3), sim(0.06, 1.02, 110.0, 8.0),
              sim(0.12, 1.05, 215.0, 20.0)]
    pairs = [(0, 1), (1, 2), (0, 2)]
    T = 64
    src, dst, ptv = [], [], []
    for (u, v) in pairs:
        canvas = rng.uniform(0, 400, (T, 2))
        hu = np.concatenate([canvas, np.ones((T, 1))], 1)
        xu = (hu @ np.linalg.inv(G_true[u]).T)[:, :2]
        xv = (hu @ np.linalg.inv(G_true[v]).T)[:, :2]
        src.append(xu + rng.normal(0, 0.3, (T, 2)))
        dst.append(xv + rng.normal(0, 0.3, (T, 2)))
        ptv.append(np.ones(T, bool))
    src, dst, ptv = np.stack(src), np.stack(dst), np.stack(ptv)
    pf = np.array([p[0] for p in pairs])
    pt = np.array([p[1] for p in pairs])
    pv = np.ones(3, bool)

    # chain-only init: G2 from composing the two noisy pair fits would
    # drift; here just perturb the truth to simulate chaining error
    G0 = np.stack([G_true[0],
                   G_true[1] @ sim(0.004, 1.002, 1.5, -1.0),
                   G_true[2] @ sim(-0.006, 0.997, 3.0, 2.0)])

    Gr = bundle_adjust_affine(G0, src, dst, ptv, pf, pt, pv,
                              anchor=0, partial=True)

    def err(G):
        # mean canvas-space disagreement over all pairs' correspondences
        tot = 0.0
        for p, (u, v) in enumerate(pairs):
            hu = np.concatenate([src[p], np.ones((T, 1))], 1) @ G[u].T
            hv = np.concatenate([dst[p], np.ones((T, 1))], 1) @ G[v].T
            tot += np.abs(hu[:, :2] - hv[:, :2]).mean()
        return tot / len(pairs)

    assert err(Gr) < err(G0) * 0.7
    for i in (1, 2):
        assert np.abs(Gr[i] - G_true[i]).max() < 1.0   # translations ~0.1px
    # anchor untouched
    assert np.allclose(Gr[0], G0[0])


def test_wave_correct_identity_set():
    R = jnp.tile(jnp.eye(3)[None], (3, 1, 1))
    out = np.asarray(wave_correct(R))
    for i in range(3):
        assert np.allclose(out[i].T @ out[i], np.eye(3), atol=1e-5)


def test_nan_padding_does_not_poison_fit():
    """Masked-out rows may contain NaN (uninitialized padding); the DLT and
    LM must be immune (regression: NaN*0 == NaN poisoned LtL)."""
    rng = np.random.default_rng(11)
    H = random_h(rng)
    src = rng.uniform(-300, 300, (64, 2)).astype(np.float32)
    dst = project(H, src).astype(np.float32)
    mask = np.ones(64, bool)
    mask[48:] = False
    src[56:] = np.nan
    dst[56:] = np.nan
    Hj, ok = dlt_homography(jnp.asarray(src), jnp.asarray(dst),
                            jnp.asarray(mask))
    assert bool(ok)
    assert np.isfinite(np.asarray(Hj)).all()
    err = np.asarray(reproj_error_sq(Hj, jnp.asarray(src), jnp.asarray(dst)))
    assert err[mask].max() < 1e-2
    Hr = lm_refine_homography(Hj, jnp.asarray(src), jnp.asarray(dst),
                              jnp.asarray(mask), 5)
    assert np.isfinite(np.asarray(Hr)).all()
