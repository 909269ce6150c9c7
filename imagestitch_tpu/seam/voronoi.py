"""Voronoi seam finder.

Equivalent of OpenCV's VoronoiSeamFinder (an alternative the reference
drivers reference alongside GraphCut/DP, ref 特征点检测.cpp:1128-1136): each
overlap pixel is assigned to the image whose mask interior is closer — i.e.
the larger L1 distance-to-border wins. Both distance transforms are the
associative-scan L1 DT (seam.distance), so the whole finder is four scans +
elementwise selects.
"""

from __future__ import annotations

import jax.numpy as jnp

from imagestitch_tpu.seam.distance import l1_distance_transform


def voronoi_seam_pair(mask1: jnp.ndarray, mask2: jnp.ndarray):
    """Resolve the overlap of two shared-frame masks by interior distance.

    mask1, mask2: (H, W) bool in the SAME canvas frame.
    Returns (mask1', mask2') with an empty intersection.
    """
    both = mask1 & mask2
    d1 = l1_distance_transform(mask1)
    d2 = l1_distance_transform(mask2)
    keep1 = d1 >= d2
    m1 = mask1 & (~both | keep1)
    m2 = mask2 & (~both | ~keep1)
    return m1, m2
