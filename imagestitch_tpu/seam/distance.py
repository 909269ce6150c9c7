"""Exact L1 distance transform as separable associative scans.

OpenCV's feather weights and Voronoi seams are built on distanceTransform
(used by the stock FeatherBlender/VoronoiSeamFinder the reference drivers
call, 特征点检测.cpp:1128-1156). The classic two-raster-scan chamfer is
sequential in both dimensions; on TPU the exact L1 transform decomposes into
four cummin passes because

    D_row(i) = min_j (D0(j) + |i - j|)
             = min( i + cummin_{j<=i}(D0(j) - j),
                    -i + cummin_{j>=i}(D0(j) + j) )

and the same applied along columns afterwards gives the exact separable L1
metric. cummin is `jax.lax.associative_scan(jnp.minimum, ...)` — log-depth,
fully parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)


def _minplus_1d(d0: jnp.ndarray, axis: int) -> jnp.ndarray:
    """min_j (d0[j] + |i-j|) along `axis`."""
    axis = axis % d0.ndim  # associative_scan(reverse=) needs a positive axis
    n = d0.shape[axis]
    shape = [1] * d0.ndim
    shape[axis] = n
    idx = jnp.arange(n, dtype=jnp.float32).reshape(shape)
    fwd = idx + jax.lax.associative_scan(jnp.minimum, d0 - idx, axis=axis)
    bwd = -idx + jax.lax.associative_scan(jnp.minimum, d0 + idx, axis=axis,
                                          reverse=True)
    return jnp.minimum(fwd, bwd)


def l1_distance_transform(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel L1 distance to the nearest pixel OUTSIDE the mask.

    mask: (..., H, W) bool. Matches cv::distanceTransform(DIST_L1) semantics
    (zero outside the mask, >= 1 inside, measured to the mask complement —
    note OpenCV measures to the nearest zero pixel, giving interior pixels
    distance >= 1 at the boundary).
    """
    d0 = jnp.where(mask, INF, 0.0)
    d = _minplus_1d(d0, axis=-1)
    d = _minplus_1d(d, axis=-2)
    return jnp.minimum(d, INF)
