"""Seam-anchored linear-ramp blender.

Reconstruction of the reference's hand-written compositor
(ref 图像融合.cpp:25-719): greedy/DP seam through the overlap strip, then
piecewise-linear weights centered on the seam (weight = 0.5 exactly at the
seam line, :529-554) and a three-region composite (left-exclusive /
overlap-blend / right-exclusive, :583-711). Here the seam comes from the DP
seam finder (strictly better than the reference's greedy 3-successor
descent, :269-307) and the composite is a single fused select over the
shared canvas.
"""

from __future__ import annotations

import jax.numpy as jnp

from imagestitch_tpu.seam.dp import dp_seam_pair, ramp_weights


def ramp_blend_pair(img1: jnp.ndarray, img2: jnp.ndarray,
                    mask1: jnp.ndarray, mask2: jnp.ndarray,
                    use_grad: bool = False,
                    max_overlap_w: int | None = None):
    """Blend two shared-frame canvases with seam-anchored ramp weights.

    use_grad/max_overlap_w thread through to the DP seam (the pipeline
    passes cfg.seam.kind's cost and its overlap window bound).
    Returns ((H, W, C), (H, W) bool, seam_cols (H,) int32).
    """
    both = mask1 & mask2
    _, _, seam = dp_seam_pair(img1, img2, mask1, mask2, use_grad,
                              max_overlap_w=max_overlap_w)

    w1 = ramp_weights(both, seam)                           # left-image weight
    # orient: ramp_weights assumes img1 is the left image; flip if not
    xs = jnp.arange(mask1.shape[1], dtype=jnp.float32)[None, :]
    m1f = mask1.astype(jnp.float32)
    m2f = mask2.astype(jnp.float32)
    cx1 = jnp.sum(m1f * xs) / jnp.maximum(jnp.sum(m1f), 1.0)
    cx2 = jnp.sum(m2f * xs) / jnp.maximum(jnp.sum(m2f), 1.0)
    w1 = jnp.where(cx1 <= cx2, w1, 1.0 - w1)

    onlym1 = mask1 & ~mask2
    onlym2 = mask2 & ~mask1
    w1_full = jnp.where(both, w1, 0.0) + onlym1.astype(jnp.float32)
    w2_full = jnp.where(both, 1.0 - w1, 0.0) + onlym2.astype(jnp.float32)

    out = (img1 * w1_full[..., None] + img2 * w2_full[..., None])
    valid = mask1 | mask2
    out = jnp.where(valid[..., None], out, 0.0)
    return out, valid, seam
