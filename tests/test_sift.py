"""SIFT-path tests: DoG extrema semantics, descriptor invariance under
translation, end-to-end stitch with kind="sift"."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagestitch_tpu.config import (
    DetectorConfig, MatcherConfig, RansacConfig, PipelineConfig, CameraConfig,
)
from imagestitch_tpu.features import detect
from imagestitch_tpu.features.sift import _dog_extrema_scores
from imagestitch_tpu.matching import match_pair, l2_distance_matrix
from imagestitch_tpu.utils.io import synthetic_pair

SIFT_CFG = DetectorConfig(kind="sift", max_keypoints=512, sift_octaves=3)

# ONE jitted detector entry shared by every test in this module (per-test
# `jax.jit(lambda ...)` wrappers each carried their own executable cache,
# recompiling the SIFT program for identical shapes)
det = jax.jit(detect, static_argnames=("cfg",))


def test_l2_distance_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(32, 128)).astype(np.float32)
    b = rng.normal(size=(24, 128)).astype(np.float32)
    D = np.asarray(l2_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    assert np.allclose(D, ref, rtol=2e-2, atol=2e-2)


def test_dog_extrema_isolated_blob():
    """A single bright blob in the middle DoG scale is the unique extremum."""
    d = np.zeros((4, 32, 32), np.float32)
    d[2, 16, 16] = 50.0  # bright point in scale 2
    score = np.array(_dog_extrema_scores(jnp.asarray(d), 5.0))
    assert score[2, 16, 16] == 50.0
    score[2, 16, 16] = 0
    assert score.max() == 0  # nothing else


def test_sift_detects_and_describes():
    img1, _, _ = synthetic_pair(192, 256, seed=40)
    gray = jnp.asarray(img1, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    f = det(gray, cfg=SIFT_CFG)
    assert f.descriptors.shape == (512, 128)
    assert f.descriptors.dtype == jnp.float32
    nv = int(f.num_valid())
    assert nv > 30
    d = np.asarray(f.descriptors)[np.asarray(f.valid)]
    norms = np.linalg.norm(d, axis=1)
    assert np.all(norms > 0.9) and np.all(norms < 1.1)  # unit-normalized
    assert d.max() <= 0.2 + 0.35  # clipped + renormalized bound-ish


def test_sift_match_translation_pair():
    img1, img2, shift = synthetic_pair(192, 256, overlap=0.5, seed=41)
    to_gray = lambda im: jnp.asarray(im, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    f1 = det(to_gray(img1), cfg=SIFT_CFG)
    f2 = det(to_gray(img2), cfg=SIFT_CFG)
    mi = match_pair(f1, f2, jax.random.key(0),
                    cfg=MatcherConfig(max_matches=256, match_conf=0.25),
                    rcfg=RansacConfig(num_hypotheses=512))
    assert bool(mi.h_valid)
    assert int(mi.num_inliers) >= 8
    H = np.array(mi.H)
    H = H / H[2, 2]
    assert abs(H[0, 2] - (-shift)) < 3.0


def test_stitch_pair_sift_end_to_end():
    from imagestitch_tpu import stitch_pair
    img1, img2, shift = synthetic_pair(192, 256, overlap=0.5, seed=42)
    cfg = PipelineConfig(
        detector=SIFT_CFG,
        matcher=MatcherConfig(max_matches=256, match_conf=0.25),
        ransac=RansacConfig(num_hypotheses=512),
        camera=CameraConfig(ba_iters=10))
    pano, metrics = stitch_pair(img1, img2, cfg)
    assert metrics["h_valid"]
    assert pano.shape[1] > 256


def test_sift_subpixel_localization():
    """Subpixel interpolation: an off-grid Gaussian blob is localized to
    well under a pixel (round-1 SIFT had integer-only extrema)."""
    H, W = 96, 96
    cy, cx = 48.4, 47.7          # deliberately off-grid
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = 200.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0 ** 2))
    f = det(jnp.asarray(img, jnp.float32),
            cfg=DetectorConfig(kind="sift", max_keypoints=64))
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    resp = np.asarray(f.response)[np.asarray(f.valid)]
    assert len(xy) > 0
    best = xy[np.argmax(resp)]
    err = np.hypot(best[0] - cx, best[1] - cy)
    assert err < 0.5, f"localization error {err:.2f} px"


def test_sift_descriptor_stability_under_rotation():
    """30-deg rotation: descriptors of corresponding keypoints still match
    (multi-peak orientations + per-scale gradient windows)."""
    rng = np.random.RandomState(5)
    H = W = 160
    base = rng.rand(H // 8, W // 8) * 255
    img = np.kron(base, np.ones((8, 8)))           # blocky texture
    # rotate 30 deg about the center with bilinear sampling (pure NumPy)
    ang = np.deg2rad(30.0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    yc, xc = yy - H / 2, xx - W / 2
    ys = np.cos(ang) * yc - np.sin(ang) * xc + H / 2
    xs = np.sin(ang) * yc + np.cos(ang) * xc + W / 2
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 2)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 2)
    fy, fx = ys - y0, xs - x0
    rot = (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0 + 1, x0] * fy * (1 - fx)
           + img[y0, x0 + 1] * (1 - fy) * fx + img[y0 + 1, x0 + 1] * fy * fx)

    cfg = DetectorConfig(kind="sift", max_keypoints=256)
    f1 = det(jnp.asarray(img, jnp.float32), cfg=cfg)
    f2 = det(jnp.asarray(rot, jnp.float32), cfg=cfg)
    v1 = np.asarray(f1.valid)
    v2 = np.asarray(f2.valid)
    assert v1.sum() > 20 and v2.sum() > 20

    D = np.array(l2_distance_matrix(f1.descriptors, f2.descriptors))
    D[~v1] = 1e9
    D[:, ~v2] = 1e9
    nn2 = np.argsort(D, axis=1)[:, :2]
    # geometric ground truth: rotate f1 keypoints INTO image-2 coords
    # (the sampling above PULLS from rotated coords, so points map by the
    # inverse rotation)
    xy1 = np.asarray(f1.xy) - np.array([W / 2, H / 2])
    gt = np.stack([np.cos(ang) * xy1[:, 0] - np.sin(ang) * xy1[:, 1],
                   np.sin(ang) * xy1[:, 0] + np.cos(ang) * xy1[:, 1]],
                  axis=1) + np.array([W / 2, H / 2])
    xy2 = np.asarray(f2.xy)
    good = 0
    total = 0
    for i in np.nonzero(v1)[0]:
        if not (20 < gt[i, 0] < W - 20 and 20 < gt[i, 1] < H - 20):
            continue
        d0, d1 = D[i, nn2[i, 0]], D[i, nn2[i, 1]]
        if d0 > 0.7 * d1:        # ambiguous match
            continue
        total += 1
        if np.hypot(*(xy2[nn2[i, 0]] - gt[i])) < 4.0:
            good += 1
    assert total >= 10, f"only {total} confident matches"
    assert good / total > 0.7, f"rotation match rate {good}/{total}"


class TestSiftVsOpenCV:
    """Differential vs cv2.SIFT (installed; the detector the reference's
    README builds NONFREE for, ref README.md:14-24; BASELINE.json's north
    star names SIFT). The oracle is BEHAVIORAL: cross-view repeatability
    under the known ground-truth homography and descriptor match quality —
    pinned to (and compared against) what cv2.SIFT achieves on the same
    scene — not keypoint-set identity, which no two SIFT implementations
    share."""

    _cache = None

    @classmethod
    def _setup(cls):
        if cls._cache is not None:
            return cls._cache
        cv2 = pytest.importorskip("cv2")
        from imagestitch_tpu.utils.io import synthetic_rotation_pair
        from imagestitch_tpu.ops.image import rgb_to_gray

        img1, img2, H_true, _ = synthetic_rotation_pair(
            360, 480, yaw_deg=9.0, pitch_deg=1.0, roll_deg=2.0, seed=11)
        cfg = DetectorConfig(kind="sift")
        f1 = det(rgb_to_gray(jnp.asarray(img1, jnp.float32)), cfg=cfg)
        f2 = det(rgb_to_gray(jnp.asarray(img2, jnp.float32)), cfg=cfg)
        cls._cache = (cv2, img1, img2, H_true, f1, f2)
        return cls._cache

    @staticmethod
    def _proj(xy, H):
        q = np.concatenate([xy, np.ones((len(xy), 1))], 1) @ H.T
        return q[:, :2] / q[:, 2:]

    @staticmethod
    def _repeatability(xy1, xy2, H, hw, r=2.0):
        proj = TestSiftVsOpenCV._proj(xy1, H)
        h, w = hw
        inb = ((proj[:, 0] >= 0) & (proj[:, 0] < w)
               & (proj[:, 1] >= 0) & (proj[:, 1] < h))
        if inb.sum() == 0:
            return 0.0, 0
        d = np.sqrt(((proj[inb][:, None] - xy2[None]) ** 2).sum(-1)).min(1)
        return float((d < r).mean()), int(inb.sum())

    def test_repeatability_matches_cv2(self):
        """Our detector's cross-view repeatability under H_true is >= 70%
        and within 5 points of cv2.SIFT's own on the same scene."""
        cv2, img1, img2, H_true, f1, f2 = self._setup()
        v1 = np.asarray(f1.valid)
        v2 = np.asarray(f2.valid)
        assert v1.sum() > 200 and v2.sum() > 200
        xy1 = np.asarray(f1.xy)[v1]
        xy2 = np.asarray(f2.xy)[v2]
        rep_ours, n_ours = self._repeatability(xy1, xy2, H_true, (360, 480))

        g1 = cv2.cvtColor(img1, cv2.COLOR_RGB2GRAY)
        g2 = cv2.cvtColor(img2, cv2.COLOR_RGB2GRAY)
        sift = cv2.SIFT_create()
        k1, _ = sift.detectAndCompute(g1, None)
        k2, _ = sift.detectAndCompute(g2, None)
        rep_cv, n_cv = self._repeatability(
            np.array([k.pt for k in k1]), np.array([k.pt for k in k2]),
            H_true, (360, 480))

        assert n_ours > 150
        assert rep_ours > 0.70, rep_ours
        assert rep_ours > rep_cv - 0.05, (rep_ours, rep_cv)

    def test_descriptor_match_rate(self):
        """L2 ratio-test matches between the two views: >= 150 confident
        matches of which >= 75% are consistent with the ground-truth H."""
        cv2, img1, img2, H_true, f1, f2 = self._setup()
        v1 = np.asarray(f1.valid)
        v2 = np.asarray(f2.valid)
        D = np.asarray(l2_distance_matrix(f1.descriptors, f2.descriptors))
        D = D[np.ix_(v1.nonzero()[0], v2.nonzero()[0])]
        nn = np.argsort(D, axis=1)[:, :2]
        d0 = D[np.arange(len(D)), nn[:, 0]]
        d1 = D[np.arange(len(D)), nn[:, 1]]
        conf = d0 < 0.75 * d1
        assert conf.sum() >= 150, int(conf.sum())

        xy1 = np.asarray(f1.xy)[v1][conf]
        xy2 = np.asarray(f2.xy)[v2][nn[conf, 0]]
        proj = self._proj(xy1, H_true)
        good = np.linalg.norm(proj - xy2, axis=1) < 3.0
        assert good.mean() > 0.75, float(good.mean())


def test_pallas_sift_octave_maps_match_xla():
    """The fused Pallas octave kernel (interpret mode) reproduces the XLA
    reference path: DoG volume and gS everywhere (the wrapper reflect-pads,
    matching _sep_filter2d's BORDER_REFLECT_101), extrema scores and
    gradients on the interior (the XLA extrema test wraps via jnp.roll at
    the 1-px border and _grad clamps instead of reflecting — both inside
    the 8-px mask)."""
    from imagestitch_tpu.features.sift import _octave_maps
    from imagestitch_tpu.ops.pallas_sift import octave_halo, sift_octave_maps

    img, _, _ = synthetic_pair(96, 160, seed=11)
    gray = jnp.asarray(img, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    S, sigma0, ct = 3, 1.6, 34.0 / 3
    assert min(gray.shape) >= 2 * octave_halo(S, sigma0, True)

    dog_x, score_x, gx_x, gy_x, gs_x = _octave_maps(
        gray, True, S, sigma0, ct, use_pallas=False)
    dog_p, score_p, gx_p, gy_p, gs_p = jax.jit(
        lambda g: sift_octave_maps(g, True, S, sigma0, ct, interpret=True)
    )(gray)

    np.testing.assert_allclose(np.asarray(dog_p), np.asarray(dog_x),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_x), atol=5e-3)
    sl = np.s_[:, 8:-8, 8:-8]
    np.testing.assert_allclose(np.asarray(gx_p)[sl], np.asarray(gx_x)[sl],
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(gy_p)[sl], np.asarray(gy_x)[sl],
                               atol=5e-3)
    # extrema scores: same nonzero set and values on the interior
    np.testing.assert_allclose(np.asarray(score_p)[sl],
                               np.asarray(score_x)[sl], atol=5e-3)


def test_pallas_sift_batched_fold():
    """The custom_vmap folds an outer batch into the kernel grid: batched
    call equals per-image calls."""
    from imagestitch_tpu.ops.pallas_sift import sift_octave_maps

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 96, 144)), jnp.float32)
    f = lambda g: sift_octave_maps(g, False, 3, 1.6, 34.0 / 3,
                                   interpret=True)
    outs_b = jax.jit(jax.vmap(f))(imgs)
    outs_0 = jax.jit(f)(imgs[0])
    outs_1 = jax.jit(f)(imgs[1])
    for ob, o0, o1 in zip(outs_b, outs_0, outs_1):
        np.testing.assert_allclose(np.asarray(ob[0]), np.asarray(o0),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ob[1]), np.asarray(o1),
                                   atol=1e-4)


def test_topk_block_candidates_contract():
    """The selection stage caps ONE candidate per (8, 16) spatial block
    PER SCALE LAYER (the documented recall tradeoff vs the exact top_k it
    replaced — features/sift.py _topk_block_candidates): within one block
    and layer only the strongest extremum survives; the same block in a
    DIFFERENT layer keeps its own winner; other blocks are independent."""
    from imagestitch_tpu.features.sift import _topk_block_candidates

    S, H, W = 2, 32, 64
    score = np.zeros((S, H, W), np.float32)
    score[0, 2, 3] = 5.0    # block (0, 0), layer 0: winner
    score[0, 4, 9] = 4.0    # same block+layer: dropped by design
    score[1, 3, 5] = 3.0    # same block, layer 1: its own winner
    score[0, 10, 40] = 2.0  # different block: kept
    top_s, top_i = _topk_block_candidates(jnp.asarray(score), 8)
    got = {(int(i), float(s))
           for s, i in zip(np.asarray(top_s), np.asarray(top_i)) if s > 0}

    def flat(layer, y, x):
        return layer * H * W + y * W + x

    assert (flat(0, 2, 3), 5.0) in got
    assert (flat(1, 3, 5), 3.0) in got
    assert (flat(0, 10, 40), 2.0) in got
    assert not any(i == flat(0, 4, 9) for i, _ in got)
    assert len(got) == 3


def test_topk_block_candidates_random_property():
    """Property vs a NumPy reference of the documented contract: the
    result set equals {per-(layer, 8x16-block) max > 0}, top-quota by
    score, with indices pointing at true argmax positions."""
    rng = np.random.default_rng(7)
    from imagestitch_tpu.features.sift import _topk_block_candidates

    for trial in range(3):
        S, H, W = 3, int(rng.integers(17, 41)), int(rng.integers(30, 70))
        score = np.zeros((S, H, W), np.float32)
        n = int(rng.integers(5, 40))
        score[rng.integers(0, S, n), rng.integers(0, H, n),
              rng.integers(0, W, n)] = rng.uniform(1, 100, n).astype(
                  np.float32)
        quota = 16
        top_s, top_i = _topk_block_candidates(jnp.asarray(score), quota)
        top_s, top_i = np.asarray(top_s), np.asarray(top_i)

        # NumPy reference: block winners per (layer, 8x16 block)
        winners = {}
        for l in range(S):
            for y in range(H):
                for x in range(W):
                    v = score[l, y, x]
                    if v <= 0:
                        continue
                    key = (l, y // 8, x // 16)
                    if key not in winners or v > winners[key][0]:
                        winners[key] = (v, l * H * W + y * W + x)
        want = sorted(winners.values(), reverse=True)[:quota]
        got = sorted(((float(s), int(i))
                      for s, i in zip(top_s, top_i) if s > 0), reverse=True)
        assert [w[0] for w in want] == [g[0] for g in got], trial
        assert {w[1] for w in want} == {g[1] for g in got}, trial
