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

import numpy as np
import jax
import jax.numpy as jnp

# np scalar, NOT jnp: a module-scope jnp scalar is an eager device array
# whose lowering-time readback stalls compilation (see matching.matcher)
INF = np.float32(1e9)


def _shift_pad(x: jnp.ndarray, k: int, axis: int, fill) -> jnp.ndarray:
    """x shifted by +k along axis (vacated slots filled)."""
    n = x.shape[axis]
    if k >= n:
        return jnp.full_like(x, fill)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, n - k) if k > 0 else slice(-k, n)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k, 0) if k > 0 else (0, -k)
    return jnp.pad(x[tuple(sl)], pad, constant_values=fill)


def _minplus_1d(d0: jnp.ndarray, axis: int, max_dist: int | None = None
                ) -> jnp.ndarray:
    """min_j (d0[j] + |i-j|) along `axis`, via Hillis–Steele doubling:
    D <- min(D, shift(D, ±2^t) + 2^t). Hand-rolled (log n unrolled shifted
    mins) instead of lax.associative_scan — the generic scan lowering
    compiled pathologically slowly (minutes) on large images, while this is
    ~2·log n fused VPU passes.

    With `max_dist`, the doubling stops once the covered window reaches
    max_dist: distances <= max_dist stay EXACT (after steps 1..2^(t-1) the
    result equals the true min over the |i-j| <= 2^t - 1 window), larger
    ones become upper bounds — callers that clamp at max_dist see no
    difference.
    """
    axis = axis % d0.ndim
    n = d0.shape[axis]
    fwd = d0
    bwd = d0
    k = 1
    limit = n if max_dist is None else min(n, max_dist + 1)
    while k < limit:
        fwd = jnp.minimum(fwd, _shift_pad(fwd, k, axis, INF) + k)
        bwd = jnp.minimum(bwd, _shift_pad(bwd, -k, axis, INF) + k)
        k *= 2
    return jnp.minimum(fwd, bwd)


def l1_distance_transform(mask: jnp.ndarray, max_dist: int | None = None
                          ) -> jnp.ndarray:
    """Per-pixel L1 distance to the nearest pixel OUTSIDE the mask.

    mask: (..., H, W) bool. Matches cv::distanceTransform(DIST_L1) semantics
    (zero outside the mask, >= 1 inside, measured to the mask complement —
    note OpenCV measures to the nearest zero pixel, giving interior pixels
    distance >= 1 at the boundary). `max_dist` bounds the exact range (see
    _minplus_1d): values above it are upper bounds >= max_dist.
    """
    d0 = jnp.where(mask, INF, 0.0)
    d = _minplus_1d(d0, axis=-1, max_dist=max_dist)
    d = _minplus_1d(d, axis=-2, max_dist=max_dist)
    return jnp.minimum(d, INF)
