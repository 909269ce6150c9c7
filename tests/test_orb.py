"""ORB detector tests: FAST corner semantics on constructed patterns,
rotation behavior of IC angles, descriptor invariances, capacity handling."""

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import DetectorConfig
from imagestitch_tpu.features import (
    detect_and_compute, fast_score_map, harris_map, nms3x3, brief_pattern,
)
from imagestitch_tpu.utils.io import synthetic_pair

CFG_SMALL = DetectorConfig(nfeatures=128, max_keypoints=512)

# one jitted detector shared by every test in the module (per-test
# jax.jit(lambda ...) wrappers each carried a private executable cache)
det = jax.jit(detect_and_compute, static_argnames=("cfg",))


def test_fast_detects_synthetic_corner():
    # bright 10x10 square on dark bg: its corners are FAST corners
    img = np.zeros((64, 64), np.float32)
    img[24:34, 24:34] = 200.0
    score = np.asarray(fast_score_map(jnp.asarray(img), 20.0))
    # corners of the square respond
    assert score[24, 24] > 0
    assert score[33, 33] > 0
    # flat regions don't
    assert score[5:15, 5:15].max() == 0
    # straight edge midpoints are not FAST-9 corners (arc < 9)
    assert score[24 + 5, 24] == 0 or score[24 + 5, 24] < score[24, 24]


def test_fast_score_monotone_in_contrast():
    def square(contrast):
        img = np.zeros((48, 48), np.float32)
        img[20:30, 20:30] = contrast
        return np.asarray(fast_score_map(jnp.asarray(img), 20.0))[20, 20]

    assert square(200.0) > square(100.0) > 0


def test_nms_keeps_single_peak():
    img = np.zeros((32, 32), np.float32)
    img[16, 16] = 5.0
    img[16, 17] = 4.0
    out = np.asarray(nms3x3(jnp.asarray(img)))
    assert out[16, 16] == 5.0
    assert out[16, 17] == 0.0


def test_harris_corner_positive_edge_negative():
    img = np.zeros((64, 64), np.float32)
    img[:32, :32] = 200.0  # one corner at (32, 32), edges along x=32/y=32
    h = np.asarray(harris_map(jnp.asarray(img), 7))
    assert h[32, 32] > 0  # corner
    assert h[10, 32] < h[32, 32]  # edge weaker than corner


def test_brief_pattern_deterministic_and_bounded():
    p1 = brief_pattern(256, 31)
    p2 = brief_pattern(256, 31)
    assert np.array_equal(p1, p2)
    assert p1.shape == (512, 2)
    assert np.sqrt((p1 ** 2).sum(1)).max() <= 13
    # no degenerate pairs
    assert not np.any(np.all(p1[0::2] == p1[1::2], axis=1))


def test_detect_and_compute_shapes_and_validity():
    img1, _, _ = synthetic_pair(240, 320, seed=3)
    gray = jnp.asarray(img1, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    feats = det(gray, cfg=CFG_SMALL)
    K = feats.capacity
    assert K == 512
    assert feats.descriptors.shape == (K, 256)
    nv = int(feats.num_valid())
    assert nv > 50  # textured synthetic scene has plenty of corners
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    # all valid keypoints inside the image with margin
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240
    # descriptors are bits
    d = np.asarray(feats.descriptors)[v]
    assert set(np.unique(d)).issubset({0, 1})
    # descriptor bits vary across keypoints (not constant)
    assert 0.05 < d.mean() < 0.95


def test_detect_translation_covariance():
    """Keypoints of a shifted image are (mostly) shifted keypoints."""
    img1, img2, shift = synthetic_pair(240, 320, overlap=0.5, seed=5)
    to_gray = lambda im: jnp.asarray(im, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    f1 = det(to_gray(img1), cfg=CFG_SMALL)
    f2 = det(to_gray(img2), cfg=CFG_SMALL)
    v1 = np.asarray(f1.valid)
    v2 = np.asarray(f2.valid)
    xy1 = np.asarray(f1.xy)[v1]
    xy2 = np.asarray(f2.xy)[v2]
    # keypoints of img2 in overlap should appear in img1 at x+shift
    xy2_in1 = xy2 + np.array([shift, 0.0])
    sel = xy2_in1[:, 0] < 320 - 8
    matched = 0
    for p in xy2_in1[sel][:100]:
        dmin = np.min(np.linalg.norm(xy1 - p, axis=1))
        matched += dmin < 2.0
    assert matched / max(len(xy2_in1[sel][:100]), 1) > 0.5


def test_descriptor_stability_under_translation():
    """The same physical corner yields (near-)identical descriptors in two
    overlapping views related by pure translation."""
    img1, img2, shift = synthetic_pair(240, 320, overlap=0.5, seed=6)
    to_gray = lambda im: jnp.asarray(im, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    f1 = det(to_gray(img1), cfg=CFG_SMALL)
    f2 = det(to_gray(img2), cfg=CFG_SMALL)
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    xy1, xy2 = np.asarray(f1.xy), np.asarray(f2.xy)
    d1, d2 = np.asarray(f1.descriptors), np.asarray(f2.descriptors)
    lev1, lev2 = np.asarray(f1.level), np.asarray(f2.level)
    # find level-0 coincident pairs
    hams = []
    for i in np.nonzero(v2 & (lev2 == 0))[0]:
        p_in1 = xy2[i] + np.array([shift, 0.0])
        cand = np.nonzero(v1 & (lev1 == 0))[0]
        dist = np.linalg.norm(xy1[cand] - p_in1, axis=1)
        j = cand[np.argmin(dist)]
        if dist.min() < 1.0:
            hams.append(np.sum(d1[j] != d2[i]))
    assert len(hams) >= 5
    # coincident corners: hamming distance well below random (128)
    assert np.median(hams) < 40


def test_wta_k_codes_match_reference_expressions():
    """wta_k=3/4 symbol codes follow the reference's exact branchy
    expressions (ref 特征点检测.cpp:354-414), checked against a literal
    NumPy transcription on random tuples."""
    import numpy as np
    import jax.numpy as jnp
    from imagestitch_tpu.features.orb import _orb_descriptors
    from imagestitch_tpu.features.pattern import orb_tuple_pattern
    from imagestitch_tpu.config import DetectorConfig

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64)).astype(np.float32)
    K = 7
    xk = jnp.asarray(rng.randint(20, 44, K), jnp.int32)
    yk = jnp.asarray(rng.randint(20, 44, K), jnp.int32)
    ang = jnp.zeros((K,), jnp.float32)   # angle 0: plain integer offsets

    for wta_k in (3, 4):
        cfg = DetectorConfig(wta_k=wta_k)
        d = np.asarray(_orb_descriptors(jnp.asarray(img), xk, yk, ang, cfg))
        assert d.shape == (K, 128 * wta_k)
        # exactly one-hot per symbol
        assert (d.reshape(K, 128, wta_k).sum(-1) == 1).all()

        pat = orb_tuple_pattern(wta_k, 128, cfg.patch_size)
        codes = d.reshape(K, 128, wta_k).argmax(-1)
        for j in range(K):
            x0, y0 = int(xk[j]), int(yk[j])
            for i in range(128):
                t = [img[y0 + int(pat[i * wta_k + m][1]),
                         x0 + int(pat[i * wta_k + m][0])]
                     for m in range(wta_k)]
                if wta_k == 3:
                    t0, t1, t2 = t
                    ref = (2 if t2 > t0 else 0) if t2 > t1 else int(t1 > t0)
                else:
                    t0, t1, t2, t3 = t
                    u = 1 if t1 > t0 else 0
                    v = 3 if t3 > t2 else 2
                    ref = u if max(t0, t1) > max(t2, t3) else v
                assert codes[j, i] == ref, (j, i, t)


def test_wta_k_end_to_end_matching():
    """The matcher stack works unchanged on one-hot wta_k=3 descriptors
    (Hamming on one-hot == 2x NORM_HAMMING2, a monotone rescale)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.config import (DetectorConfig, MatcherConfig,
                                        RansacConfig)
    from imagestitch_tpu.features import detect
    from imagestitch_tpu.matching.matcher import match_pair
    from imagestitch_tpu.utils.io import synthetic_pair
    from imagestitch_tpu.ops.image import rgb_to_gray

    i1, i2, shift = synthetic_pair(192, 320, overlap=0.5, seed=2)
    cfg = DetectorConfig(wta_k=3, nfeatures=256, max_keypoints=512)
    jdet = jax.jit(detect, static_argnames=("cfg",))
    f1 = jdet(rgb_to_gray(jnp.asarray(i1, jnp.float32)), cfg=cfg)
    f2 = jdet(rgb_to_gray(jnp.asarray(i2, jnp.float32)), cfg=cfg)
    assert f1.descriptors.shape[1] == 384
    mcfg, rcfg = MatcherConfig(max_matches=256), RansacConfig()
    mi = jax.jit(lambda a, b, k: match_pair(a, b, k, 0, 1, mcfg, rcfg))(
        f1, f2, jax.random.key(0))
    assert bool(mi.h_valid)
    H = np.asarray(mi.H)
    # recovered homography is the expected translation
    assert abs(H[0, 2] - (-shift)) < 2.0


def test_pallas_detect_maps_match_xla():
    """The fused Pallas detector-maps kernel (ops.pallas_detect) matches
    the XLA reference implementations on the interior (borders differ by
    padding mode; the detector masks edge_threshold=31 anyway)."""
    import numpy as np
    import jax.numpy as jnp
    from imagestitch_tpu.ops.pallas_detect import detect_maps
    from imagestitch_tpu.features.fast import (fast_score_map, nms3x3,
                                               harris_map)
    from imagestitch_tpu.ops.image import gaussian_blur

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randint(0, 255, (100, 150)).astype(np.float32))
    nms_p, har_p, blur_p = detect_maps(img, 20.0, interpret=True)
    nms_x = nms3x3(fast_score_map(img, 20.0))
    har_x = harris_map(img, 7)
    blur_x = gaussian_blur(img, 7, 2.0)
    B = 8
    assert np.array_equal(np.asarray(nms_p)[B:-B, B:-B],
                          np.asarray(nms_x)[B:-B, B:-B])
    np.testing.assert_allclose(np.asarray(har_p)[B:-B, B:-B],
                               np.asarray(har_x)[B:-B, B:-B], rtol=2e-6,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(blur_p)[B:-B, B:-B],
                               np.asarray(blur_x)[B:-B, B:-B], rtol=2e-6,
                               atol=1e-3)


def test_ic_angles_prefix_matches_patch_gather():
    """Prefix-sum IC angles equal the direct circular-patch formulation."""
    import numpy as np
    import jax.numpy as jnp
    from imagestitch_tpu.features.orb import (_ic_angles,
                                              _gather_patch_values)
    from imagestitch_tpu.features.pattern import ic_angle_offsets

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(180, 260).astype(np.float32) * 255)
    K = 50
    xk = jnp.asarray(rng.randint(31, 229, K), jnp.int32)
    yk = jnp.asarray(rng.randint(31, 149, K), jnp.int32)
    du, dv, inside = ic_angle_offsets(15)
    vals = _gather_patch_values(img, xk, yk, jnp.asarray(du),
                                jnp.asarray(dv))
    w = jnp.asarray(inside)
    m10 = jnp.sum(vals * (jnp.asarray(du, jnp.float32) * w)[None], 1)
    m01 = jnp.sum(vals * (jnp.asarray(dv, jnp.float32) * w)[None], 1)
    ref = np.asarray(jnp.arctan2(m01, m10))
    new = np.asarray(_ic_angles(img, xk, yk, 15))
    err = np.abs(np.angle(np.exp(1j * (ref - new)))).max()
    assert err < 2e-3, err


class TestOrbVsOpenCV:
    """Differential vs cv2.ORB (VERDICT r3 item 10; the reference's own
    golden methodology is side-by-side original-vs-reconstructed keypoints,
    ref 特征点检测.cpp:1047-1054)."""

    @staticmethod
    def _setup():
        import pytest
        cv2 = pytest.importorskip("cv2")
        from imagestitch_tpu.ops.image import rgb_to_gray
        img, _, _ = synthetic_pair(480, 640, seed=0)
        gray8 = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        grayf = np.asarray(rgb_to_gray(jnp.asarray(img, jnp.float32)))
        orb = cv2.ORB_create(nfeatures=510, scaleFactor=1.3, nlevels=5,
                             edgeThreshold=31, patchSize=31,
                             fastThreshold=20)
        return cv2, img, gray8, grayf, orb

    def test_keypoint_repeatability(self):
        """Most cv2.ORB keypoints have one of ours within 3 px and vice
        versa (detectors differ in selection: block-max + per-cell quotas
        here vs retainBest there; measured 0.69/0.74 @3px)."""
        cv2, img, gray8, grayf, orb = self._setup()
        kps = orb.detect(gray8, None)
        cxy = np.array([k.pt for k in kps], np.float32)

        cfg = DetectorConfig()
        ours = det(jnp.asarray(grayf), cfg=cfg)
        oxy = np.asarray(ours.xy)[np.asarray(ours.valid)]

        d = np.linalg.norm(cxy[:, None, :] - oxy[None, :, :], axis=-1)
        assert (d.min(1) <= 3.0).mean() > 0.55   # cv2 kpts found by ours
        assert (d.min(0) <= 3.0).mean() > 0.55   # ours found by cv2

    def test_opencv_pattern_descriptor_bits_match(self):
        """With DetectorConfig(pattern="opencv") our rotated-BRIEF sampler
        reproduces cv2.ORB's descriptor BITS on cv2's own keypoints/angles
        (level-0): measured 95.3% mean bit agreement — residual is blur/
        resize rounding. Framework-pattern descriptors CANNOT match (the
        point pairs differ), so this pins the whole sampling pipeline:
        pattern data, rotation rounding (GET_VALUE cvRound), blur, and
        bit order."""
        cv2, img, gray8, grayf, orb = self._setup()
        from imagestitch_tpu.features.orb import _orb_descriptors
        from imagestitch_tpu.ops.image import gaussian_blur

        kps, desc = orb.detectAndCompute(gray8, None)
        sel = [i for i, k in enumerate(kps) if k.octave == 0]
        assert len(sel) >= 20
        xk = jnp.asarray(np.round([kps[i].pt[0] for i in sel])
                         .astype(np.int32))
        yk = jnp.asarray(np.round([kps[i].pt[1] for i in sel])
                         .astype(np.int32))
        ang = jnp.asarray(np.deg2rad([kps[i].angle for i in sel])
                          .astype(np.float32))
        blurred = gaussian_blur(jnp.asarray(grayf), 7, 2.0)

        cfg = DetectorConfig(pattern="opencv")
        dd = np.asarray(_orb_descriptors(blurred, xk, yk, ang, cfg))
        cvbits = np.unpackbits(desc[sel], axis=1, bitorder="little")
        agree = (dd == cvbits).mean(axis=1)
        assert agree.mean() > 0.88
        assert np.median(agree) > 0.90
