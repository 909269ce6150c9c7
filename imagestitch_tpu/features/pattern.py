"""BRIEF sampling pattern for the ORB descriptor.

The reference bakes in OpenCV's learned 256-pair `bit_pattern_31_` table
(ref 特征点检测.cpp:448-706) next to a `makeRandomPattern` fallback (:709-719)
that draws uniform points in the patch. This framework generates its own
deterministic pattern (seeded Gaussian, the BRIEF paper's recommended
σ = patch_size/5 distribution) by default: descriptors are self-consistent
within the framework, which is what matching requires, and the generator
reproduces the reference's `makeRandomPattern` capability.

For differential testing against cv2.ORB, `brief_pattern_opencv` loads
OpenCV's learned table (data/orb_pattern_cv.npy — the bit_pattern_31_
DATA from OpenCV's orb.cpp, BSD-3-Clause, trained offline by Rublee et
al. for low inter-bit correlation; the reference transcribes the same
table at 特征点检测.cpp:448-706). Select it with
DetectorConfig(pattern="opencv").
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

PATTERN_SEED = 0x34985739  # the reference's RNG seed (ref 特征点匹配.cpp:75)


@functools.lru_cache(maxsize=None)
def brief_pattern(n_pairs: int = 256, patch_size: int = 31,
                  seed: int = PATTERN_SEED) -> np.ndarray:
    """Deterministic (2*n_pairs, 2) int32 array of (x, y) sample offsets.

    Gaussian σ = patch_size/5 (BRIEF's G-II distribution), clipped so that a
    rotated sample never leaves a (patch_size+6)-wide patch: |p| <= 13 for
    patch 31, mirroring the extent of OpenCV's learned table.
    """
    rng = np.random.default_rng(seed)
    sigma = patch_size / 5.0
    rmax = patch_size // 2 - 2  # 13 for patch 31
    pts = np.zeros((2 * n_pairs, 2), np.int32)
    count = 0
    while count < 2 * n_pairs:
        cand = rng.normal(0.0, sigma, size=(2 * n_pairs, 2))
        cand = np.round(cand).astype(np.int32)
        norm = np.sqrt((cand ** 2).sum(1))
        cand = cand[norm <= rmax]
        take = min(len(cand), 2 * n_pairs - count)
        pts[count:count + take] = cand[:take]
        count += take
    # drop degenerate pairs (identical endpoints give constant bits):
    # nudge the second point of any identical pair by one pixel in x
    a = pts[0::2]
    b = pts[1::2]
    same = np.all(a == b, axis=1)
    b[same, 0] = np.clip(b[same, 0] + 1, -rmax, rmax)
    pts[1::2] = b
    return pts


@functools.lru_cache(maxsize=None)
def brief_pattern_opencv() -> np.ndarray:
    """OpenCV's learned 256-pair sampling table as (512, 2) int32 (x, y)
    offsets, pairs interleaved like `brief_pattern` (bit b compares points
    2b and 2b+1). Offsets lie within the 31x31 patch (|x|,|y| <= 13), so
    rotated samples stay inside the edge_threshold border like the
    framework pattern's."""
    data = np.load(Path(__file__).resolve().parent / "data"
                   / "orb_pattern_cv.npy")                  # (256, 4) int8
    return data.reshape(512, 2).astype(np.int32)


@functools.lru_cache(maxsize=None)
def ic_angle_offsets(half_patch: int = 15):
    """Circular-patch offsets and weights for the intensity-centroid angle
    (ref ICAngles :250-283 with the u_max table built at :820-833).

    Returns (du, dv, inside): flattened (P,) int32 offset grids over the
    (2h+1)² patch and a float32 mask selecting the circle u_max(v) = the
    symmetrized cvRound(sqrt(h² - v²)) of the reference.
    """
    h = half_patch
    # OpenCV builds u_max for v in [0, h*sqrt(2)/2+1] via round(sqrt(h^2-v^2))
    # and symmetrizes the corner band; the net effect is a disc of radius h.
    vs, us = np.mgrid[-h:h + 1, -h:h + 1]
    umax = np.round(np.sqrt(np.maximum(h * h - vs.astype(np.float64) ** 2,
                                       0.0)))
    inside = (np.abs(us) <= umax).astype(np.float32)
    return (us.reshape(-1).astype(np.int32),
            vs.reshape(-1).astype(np.int32),
            inside.reshape(-1))


@functools.lru_cache(maxsize=None)
def orb_tuple_pattern(tuple_size: int, ntuples: int = 128,
                      patch_size: int = 31,
                      seed: int = PATTERN_SEED) -> np.ndarray:
    """Sampling tuples for wta_k ∈ {3, 4} descriptors.

    Mirrors the reference's initializeOrbPattern (ref 特征点检测.cpp
    :421-447): each of `ntuples` code symbols compares `tuple_size`
    DISTINCT points drawn from the base BRIEF point pool. Returns
    (ntuples*tuple_size, 2) int32 offsets.
    """
    pool = brief_pattern(256, patch_size, seed)     # (512, 2) point pool
    rng = np.random.default_rng(seed ^ 0x9E3779B9)
    out = np.zeros((ntuples * tuple_size, 2), np.int32)
    for i in range(ntuples):
        chosen: list[tuple[int, int]] = []
        while len(chosen) < tuple_size:
            p = tuple(pool[rng.integers(0, len(pool))])
            if p not in chosen:
                chosen.append(p)
        out[i * tuple_size:(i + 1) * tuple_size] = chosen
    return out
