"""Canvas-frame alignment utilities.

Warped images live in per-image static canvases with dynamic integer corner
offsets (warp.WarpResult), mirroring OpenCV's (image, corner) pairs that the
reference driver threads through exposure/seam/blend (特征点检测.cpp:
corners/images_warped/masks_warped vectors, :1086-1123). Aligning two frames
is a pure integer-offset gather — static shapes, jit-safe — implemented as a
translation remap.
"""

from __future__ import annotations

import jax.numpy as jnp

from imagestitch_tpu.ops.image import remap_nearest


def shift_to_frame(src: jnp.ndarray, src_corner: jnp.ndarray,
                   dst_corner: jnp.ndarray, dst_hw: tuple[int, int],
                   fill: float = 0.0) -> jnp.ndarray:
    """Resample `src` (H, W[, C]) whose canvas origin sits at pano coords
    `src_corner` (x, y) into a (dst_hw) canvas with origin `dst_corner`.

    Pure integer translation -> nearest gather is exact.
    """
    Hd, Wd = dst_hw
    off = (src_corner - dst_corner).astype(jnp.float32)   # (x, y)
    xs = jnp.arange(Wd, dtype=jnp.float32)[None, :] - off[0]
    ys = jnp.arange(Hd, dtype=jnp.float32)[:, None] - off[1]
    xmap = jnp.broadcast_to(xs, (Hd, Wd))
    ymap = jnp.broadcast_to(ys, (Hd, Wd))
    out, _ = remap_nearest(src, xmap, ymap, border_value=fill)
    return out


def union_corner_size(corners: jnp.ndarray, sizes: jnp.ndarray):
    """Bounding box of per-image ROIs: corners (N, 2) int32 (x, y),
    sizes (N, 2) int32 (w, h) -> (corner (2,), size (2,))."""
    lo = jnp.min(corners, axis=0)
    hi = jnp.max(corners + sizes, axis=0)
    return lo, hi - lo
