"""Pano autocrop: largest axis-aligned interior rectangle of the valid mask.

Stitched panoramas have irregular borders (warped quadrilaterals + blend
feathering); the standard post-step in stitching apps is cropping to the
largest rectangle of fully valid pixels. The reference has no equivalent
(its drivers imwrite the raw canvas, ref 特征点检测.cpp:1184) — this is a
beyond-reference convenience exposed as `Stitcher`/CLI `--crop`.

TPU-native formulation: the classic maximal-rectangle DP ("largest rectangle
of 1s") is one `lax.scan` over rows. Per row, with `height[j]` = run of
valid rows ending here at column j:

  left[j]  = max(left_prev[j],  1 + last invalid column <= j)   (cummax)
  right[j] = min(right_prev[j], first invalid column >= j)      (rev cummin)
  area[j]  = (right[j] - left[j]) * height[j]

All three recurrences are vectorized (cummax/cummin along the row), so the
scan carries only O(W) state — no per-pixel host loops, O(H·W) total work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def largest_interior_rect(mask: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool -> int32[4] (y0, x0, h, w), the largest all-valid
    axis-aligned rectangle. Zero-area masks return (0, 0, 0, 0)."""
    H, W = mask.shape
    jdx = jnp.arange(W, dtype=jnp.int32)

    def step(carry, row):
        height, left, right = carry
        row = row.astype(jnp.bool_)
        height = jnp.where(row, height + 1, 0)
        # last invalid column at or before j, +1 (0 if none)
        cur_left = jax.lax.cummax(jnp.where(row, 0, jdx + 1))
        left = jnp.where(row, jnp.maximum(left, cur_left), 0)
        # first invalid column at or after j (W if none)
        cur_right = jax.lax.cummin(jnp.where(row, W, jdx), reverse=True)
        right = jnp.where(row, jnp.minimum(right, cur_right), W)
        area = (right - left) * height
        j = jnp.argmax(area)
        best = jnp.stack([area[j], height[j], left[j], right[j]])
        return (height, left, right), best

    init = (jnp.zeros(W, jnp.int32), jnp.zeros(W, jnp.int32),
            jnp.full((W,), W, jnp.int32))
    _, per_row = jax.lax.scan(step, init,
                              mask.astype(jnp.int32), length=H)
    i = jnp.argmax(per_row[:, 0])
    area, h, l, r = per_row[i]
    y0 = i.astype(jnp.int32) + 1 - h
    return jnp.where(area > 0,
                     jnp.stack([y0, l, h, r - l]),
                     jnp.zeros(4, jnp.int32))


def autocrop(pano: np.ndarray, mask: np.ndarray):
    """Host convenience: crop `pano` (H, W[, C]) to the largest interior
    rectangle of `mask` (H, W bool). Returns (cropped, (y0, x0, h, w))."""
    y0, x0, h, w = (int(v) for v in np.asarray(
        largest_interior_rect(jnp.asarray(np.asarray(mask, bool)))))
    return np.asarray(pano)[y0:y0 + h, x0:x0 + w], (y0, x0, h, w)
