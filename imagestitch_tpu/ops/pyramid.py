"""Image pyramid construction for the ORB detector.

The reference packs all nlevels into one buffer and resamples the full image
per level with INTER_LINEAR (ref 特征点检测.cpp:780-861, getScale :721-726).
The TPU-native version keeps each level as its own static-shape array (a
Python tuple unrolled inside jit — XLA sees 5 fixed-shape resizes), which is
friendlier to fusion than one packed dynamic layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from imagestitch_tpu.ops.image import resize


def level_scale(level: int, scale_factor: float, first_level: int = 0) -> float:
    """getScale (ref 特征点检测.cpp:721-726): scale of `level` relative to the
    source image; keypoint coords at that level multiply by this to return to
    source coordinates."""
    return float(scale_factor) ** (level - first_level)


def level_shape(hw: tuple[int, int], level: int, scale_factor: float,
                first_level: int = 0) -> tuple[int, int]:
    """Rounded level size, matching cvRound(size/getScale(level)) at
    ref 特征点检测.cpp:786-792."""
    s = level_scale(level, scale_factor, first_level)
    return (int(round(hw[0] / s)), int(round(hw[1] / s)))


def build_pyramid(gray: jnp.ndarray, nlevels: int, scale_factor: float,
                  first_level: int = 0) -> tuple[jnp.ndarray, ...]:
    """Build an nlevels pyramid of (H_l, W_l) float32 grayscale images.

    Level 0 is the source image; each level l is the source resampled by
    1/scale_factor**l with INTER_LINEAR (the reference resizes from the
    previous level; resampling from the source avoids compounding
    interpolation error and is one fused resize per level on TPU).
    """
    H, W = gray.shape
    levels = []
    for l in range(nlevels):
        h, w = level_shape((H, W), l, scale_factor, first_level)
        if (h, w) == (H, W):
            levels.append(gray.astype(jnp.float32))
        else:
            levels.append(resize(gray, (h, w), "linear"))
    return tuple(levels)
