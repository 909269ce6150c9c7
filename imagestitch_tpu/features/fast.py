"""FAST-9/16 corner scores and Harris responses as dense, fully-vectorized
map computations.

The reference's detector calls OpenCV's per-pixel FastFeatureDetector and a
per-keypoint HarrisResponses loop (ref 特征点检测.cpp:118-119 and :204-249).
The TPU-native formulation computes the whole score map at once: 16 shifted
views of the image (the Bresenham circle), arc tests via a cumulative-sum
window trick, and non-max suppression via a 3x3 max-pool — all fusable
elementwise/VPU work with no data-dependent control flow.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

# Bresenham circle of radius 3, 16 points in circular order (dx, dy) —
# the FAST-16 sampling ring.
CIRCLE16 = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)

ARC_LEN = 9  # FAST-9: a corner needs >= 9 contiguous brighter/darker pixels


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9/16 corner score map, 0 where not a corner.

    Score is OpenCV's definition: the largest threshold at which the pixel is
    still a corner = max over valid 9-arcs of the arc's min |difference|.
    img: (H, W) float32. Borders (3 px) are implicitly garbage via roll
    wraparound; callers mask a >=3 px border (the detector masks
    edge_threshold anyway).
    """
    img = img.astype(jnp.float32)
    # d[k] = I(p + offset_k) - I(p); roll(-dy,-dx) brings (y+dy, x+dx) to (y,x)
    shifted = [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1))
               for dx, dy in CIRCLE16]
    d = jnp.stack(shifted, axis=0) - img[None]              # (16, H, W)
    d_ext = jnp.concatenate([d, d[:ARC_LEN - 1]], axis=0)    # wrap (24, H, W)

    t = jnp.float32(threshold)
    # all 16 sliding 9-windows at once along the arc axis: one reduce_window
    # per statistic instead of an unrolled per-arc loop (compiles ~10x
    # faster, same fused VPU work)
    def win(x, init, op):
        return lax.reduce_window(x, init, op, (ARC_LEN, 1, 1), (1, 1, 1),
                                 "VALID")                     # (16, H, W)

    arc_min = win(d_ext, jnp.inf, lax.min)
    arc_max = win(d_ext, -jnp.inf, lax.max)
    all_bright = arc_min > t        # every element of the arc > t
    all_dark = arc_max < -t         # every element < -t
    neg_inf = jnp.float32(-3.4e38)
    score_b = jnp.where(all_bright, arc_min, neg_inf)
    score_d = jnp.where(all_dark, -arc_max, neg_inf)
    score = jnp.max(jnp.maximum(score_b, score_d), axis=0)
    return jnp.maximum(score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression: keep strictly-positive local maxima."""
    mx = lax.reduce_window(score, -jnp.inf, lax.max, (3, 3), (1, 1),
                           [(1, 1), (1, 1)])
    return jnp.where((score >= mx) & (score > 0), score, 0.0)


def harris_map(img: jnp.ndarray, block_size: int = 7,
               k: float = 0.04) -> jnp.ndarray:
    """Dense Harris response with a block_size box window and [-1, 0, 1]
    central-difference gradients — the dense-map equivalent of the
    reference's per-keypoint HarrisResponses (:204-249), including its
    1/(4·block·255)⁴ scaling so response magnitudes match.
    """
    img = img.astype(jnp.float32)
    Ix = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1)) * 2.0
    Iy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0)) * 2.0

    def box(x):
        # separable: row then column pass (2·b instead of b² adds per pixel)
        x = lax.reduce_window(
            x, 0.0, lax.add, (block_size, 1), (1, 1),
            [(block_size // 2, block_size // 2), (0, 0)])
        return lax.reduce_window(
            x, 0.0, lax.add, (1, block_size), (1, 1),
            [(0, 0), (block_size // 2, block_size // 2)])

    a = box(Ix * Ix)
    b = box(Iy * Iy)
    c = box(Ix * Iy)
    scale = 1.0 / (4 * block_size * 255.0)
    s4 = jnp.float32(scale ** 4)
    return (a * b - c * c - k * (a + b) * (a + b)) * s4
