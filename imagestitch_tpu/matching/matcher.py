"""Pairwise feature matching + per-pair homography.

Reconstruction of ref 特征点匹配.cpp BestOf2NearestMatcher1 (:107-229) and
the all-pairs driver FeaturesMatcher1::operator() (:123-152):

- 2-NN search in BOTH directions with Lowe's ratio test
  d0 < (1 − match_conf)·d1 (ref :258-287), realized as two top-k passes over
  one exact Hamming distance matrix (matching.hamming) instead of FLANN;
- duplicate suppression when merging the two directions (the reference's
  std::set dedup :285-286) via a mutual-best check on fixed-shape arrays;
- center-normalized points into RANSAC (ref :170-181), Brown–Lowe confidence
  num_inliers / (8 + 0.3·num_matches) (:194), confidence > 3 ⇒ 0 (:198);
- the i<j pair enumeration + deterministic per-pair RNG folding replaces the
  cv::parallel_for_ + reseed of the reference (:62-106, :139-142): on TPU
  all pairs are vmapped into one dispatch.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import MatcherConfig, RansacConfig
from imagestitch_tpu.geometry.ransac import find_homography
from imagestitch_tpu.matching.hamming import (
    hamming_distance_matrix, l2_distance_matrix)
from imagestitch_tpu.types import ImageFeatures, MatchesInfo

# np scalar, NOT jnp: jnp.float32(...) at module scope creates an EAGER
# device array at import; embedding it as a jit constant forces a
# device->host readback during lowering (minutes on a tunneled TPU)
BIG = np.float32(3.0e38)


def _two_nn(D: jnp.ndarray, ratio_keep: float):
    """Row-wise 2-NN with ratio test. D: (N, M) with +inf at invalid entries.
    Returns (best_j, best_d, keep).

    Implemented as two min/argmin passes rather than jax.lax.top_k: XLA's
    batched top_k lowers to a full row sort on TPU and cost ~500 ms on a
    1536x1536 matrix; the two reduction passes are bandwidth-bound (<1 ms).
    """
    if D.shape[1] < 2:  # degenerate capacity: pad a BIG column for the 2-NN
        D = jnp.concatenate([D, jnp.full((D.shape[0], 2 - D.shape[1]), BIG)],
                            axis=1)
    d0 = jnp.min(D, axis=1)
    best_j = jnp.argmin(D, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    d1 = jnp.min(jnp.where(cols == best_j[:, None], BIG, D), axis=1)
    keep = (d0 < ratio_keep * d1) & (d0 < BIG)
    return best_j, d0, keep


def match_pair_descriptors(f1: ImageFeatures, f2: ImageFeatures,
                           cfg: MatcherConfig = MatcherConfig()):
    """Bidirectional ratio-tested matches between two feature sets.

    Returns (pairs, dist, valid): (M, 2) int32 (idx into f1, idx into f2),
    (M,) float32 distances, (M,) bool — padded to cfg.max_matches, sorted by
    ascending distance.
    """
    N = f1.capacity
    M = f2.capacity
    # dtype dispatch: binary (ORB rBRIEF) -> Hamming; float (SIFT) -> L2
    if jnp.issubdtype(f1.descriptors.dtype, jnp.floating):
        D = l2_distance_matrix(f1.descriptors, f2.descriptors)
    else:
        D = hamming_distance_matrix(f1.descriptors, f2.descriptors)
    D = jnp.where(f1.valid[:, None] & f2.valid[None, :], D, BIG)
    ratio_keep = jnp.float32(1.0 - cfg.match_conf)

    # forward 1->2 (ref :258-270) and backward 2->1 (ref :272-287)
    fj, fd, fk = _two_nn(D, ratio_keep)          # per f1 row
    bj, bd, bk = _two_nn(D.T, ratio_keep)        # per f2 row

    # backward match (bj[j], j) duplicates a forward match iff forward kept
    # the same (i, j) (the reference's set-based dedup)
    dup = fk[bj] & (fj[bj] == jnp.arange(M))
    bk = bk & jnp.logical_not(dup)

    pairs = jnp.concatenate([
        jnp.stack([jnp.arange(N), fj], axis=1),
        jnp.stack([bj, jnp.arange(M)], axis=1),
    ], axis=0)                                   # (N+M, 2)
    dist = jnp.concatenate([fd, bd])
    valid = jnp.concatenate([fk, bk])

    # compact to max_matches, valid-first ordered by ascending distance
    if pairs.shape[0] < cfg.max_matches:  # tiny capacities: pad candidates
        deficit = cfg.max_matches - pairs.shape[0]
        pairs = jnp.concatenate([pairs, jnp.zeros((deficit, 2), jnp.int32)])
        dist = jnp.concatenate([dist, jnp.full((deficit,), BIG)])
        valid = jnp.concatenate([valid, jnp.zeros((deficit,), bool)])
    keymat = jnp.where(valid, -dist, -BIG)
    _, order = jax.lax.top_k(keymat, cfg.max_matches)
    return pairs[order], dist[order], valid[order]


def match_pair(f1: ImageFeatures, f2: ImageFeatures, key: jax.Array,
               src_idx=0, dst_idx=1,
               cfg: MatcherConfig = MatcherConfig(),
               rcfg: RansacConfig = RansacConfig()) -> MatchesInfo:
    """Full per-pair matching: descriptors → RANSAC H → confidence
    (ref BestOf2NearestMatcher1::match :154-229). H maps f1's
    center-normalized points into f2's."""
    pairs, dist, valid = match_pair_descriptors(f1, f2, cfg)

    if cfg.motion == "homography":
        # center-normalize (ref :170-178 subtracts the image center)
        c1 = 0.5 * jnp.flip(f1.img_size.astype(jnp.float32))   # (cx, cy)
        c2 = 0.5 * jnp.flip(f2.img_size.astype(jnp.float32))
        src = f1.xy[pairs[:, 0]] - c1
        dst = f2.xy[pairs[:, 1]] - c2
    else:
        # AffineBestOf2NearestMatcher estimates on RAW keypoint coords
        # (cv2 matchers.cpp — no center shift), one pass, no inlier refit
        src = f1.xy[pairs[:, 0]]
        dst = f2.xy[pairs[:, 1]]

    enough = jnp.sum(valid.astype(jnp.int32)) >= cfg.num_matches_thresh1
    if cfg.motion == "homography":
        res = find_homography(src, dst, valid, key, rcfg)
    else:
        from imagestitch_tpu.geometry.affine import find_affine
        res = find_affine(src, dst, valid, key, rcfg,
                          partial=cfg.motion == "affine_partial")
    h_ok = res.ok & enough

    num_matches = jnp.sum(valid.astype(jnp.int32))
    conf = res.num_inliers.astype(jnp.float32) / (
        8.0 + 0.3 * num_matches.astype(jnp.float32))
    if cfg.motion == "homography":
        # "too close to be believable" (ref :198): conf > 3 => 0. OpenCV's
        # AffineBestOf2NearestMatcher does NOT zero it (the line is
        # commented out in cv2's matchers.cpp) — heavy overlap is the
        # NORMAL case for scans, so the affine motions keep the raw value.
        conf = jnp.where(conf > 3.0, 0.0, conf)
    conf = jnp.where(h_ok, conf, 0.0)

    if cfg.motion == "homography":
        # literal second findHomography pass on inliers only (ref
        # :201-229): gated on num_inliers >= num_matches_thresh2, replaces
        # H but keeps the first pass's inlier mask/count/confidence,
        # exactly like the reference. On the (clean) inlier set the
        # reference's ADAPTIVE RANSAC collapses to a handful of iterations
        # (RANSACUpdateNumIters with inlier ratio ~1), so the fixed
        # hypothesis batch shrinks accordingly instead of re-paying the
        # full first-pass batch. (The affine matcher has no second pass —
        # its LS refit already is the exact minimizer.)
        rcfg_refit = dataclasses.replace(
            rcfg, num_hypotheses=min(256, rcfg.num_hypotheses))
        refit = find_homography(src, dst, res.inliers & valid,
                                jax.random.fold_in(key, 1), rcfg_refit)
        do_refit = (res.num_inliers >= cfg.num_matches_thresh2) & refit.ok
        H = jnp.where(do_refit, refit.H, res.H)
    else:
        H = res.H

    return MatchesInfo(
        src_idx=jnp.int32(src_idx), dst_idx=jnp.int32(dst_idx),
        pairs=pairs, distance=dist, valid=valid,
        inliers=res.inliers & valid,
        num_inliers=jnp.where(h_ok, res.num_inliers, 0),
        H=jnp.where(h_ok, H, jnp.eye(3, dtype=jnp.float32)),
        h_valid=h_ok, confidence=conf)


def match_all(feats: ImageFeatures, key: jax.Array,
              cfg: MatcherConfig = MatcherConfig(),
              rcfg: RansacConfig = RansacConfig()) -> MatchesInfo:
    """All i<j pairs over a BATCHED ImageFeatures (leading axis = image).

    The TPU equivalent of the reference's parallel_for_ over near_pairs
    (:131-142): a vmap over the static pair list, with per-pair keys folded
    from (i, j) so results are independent of evaluation order (the
    determinism idea of ref :71-75).

    cfg.range_width > 0 restricts to pairs with j - i <= range_width
    (OpenCV BestOf2NearestRangeMatcher: ordered sequences match O(N*w)
    pairs instead of O(N^2)).
    """
    n = feats.xy.shape[0]
    w = cfg.range_width if cfg.range_width > 0 else n
    pf, pt = [], []
    for i in range(n):
        for j in range(i + 1, min(i + w + 1, n)):
            pf.append(i)
            pt.append(j)
    pf = jnp.asarray(pf, jnp.int32)
    pt = jnp.asarray(pt, jnp.int32)
    keys = jax.vmap(lambda a, b: jax.random.fold_in(
        jax.random.fold_in(key, a), b))(pf, pt)

    def one(i, j, k):
        f1 = jax.tree.map(lambda a: a[i], feats)
        f2 = jax.tree.map(lambda a: a[j], feats)
        return match_pair(f1, f2, k, i, j, cfg, rcfg)

    return jax.vmap(one)(pf, pt, keys)
