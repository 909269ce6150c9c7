"""SIFT-path tests: DoG extrema semantics, descriptor invariance under
translation, end-to-end stitch with kind="sift"."""

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import (
    DetectorConfig, MatcherConfig, RansacConfig, PipelineConfig, CameraConfig,
)
from imagestitch_tpu.features import detect
from imagestitch_tpu.features.sift import _dog_extrema_scores
from imagestitch_tpu.matching import match_pair, l2_distance_matrix
from imagestitch_tpu.utils.io import synthetic_pair

SIFT_CFG = DetectorConfig(kind="sift", max_keypoints=512, sift_octaves=3)


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
    f = jax.jit(lambda g: detect(g, SIFT_CFG))(gray)
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
    det = jax.jit(lambda g: detect(g, SIFT_CFG))
    f1 = det(to_gray(img1))
    f2 = det(to_gray(img2))
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
