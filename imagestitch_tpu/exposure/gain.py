"""Gain exposure compensation.

TPU-native equivalent of OpenCV's ExposureCompensator::GAIN, which the
reference driver feeds with warped images + corners and applies per image
(ref 特征点检测.cpp:1114-1121). The Brown–Lowe gain model: one scalar gain
per image minimizing, over all overlapping pairs,

   Σ_ij N_ij [ α (g_i Ī_ij − g_j Ī_ji)² + β (1 − g_i)² ]

(α = error weight 0.01, β = prior weight 100 — OpenCV's constants), solved
as an N×N linear system. Overlap statistics are computed entirely on device
from per-image canvases + dynamic corners (frame-shift gathers), and the
solve is a tiny jnp.linalg.solve — the whole compensator is one jitted
function over the batched warp results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagestitch_tpu.blend.frame import shift_to_frame
from imagestitch_tpu.ops.image import rgb_to_gray


def _pair_stats(img_i, mask_i, corner_i, img_j, mask_j, corner_j,
                shared_frame: bool = False):
    """N_ij (overlap area) and mean intensities Ī_ij, Ī_ji over the overlap,
    computed in image i's frame.

    shared_frame=True skips the frame-alignment gathers (all canvases share
    one origin — the jitted pipeline's layout); the generic path re-gathers
    image j into i's frame and costs two full-canvas gathers per pair.
    """
    if shared_frame:
        mj = mask_j.astype(jnp.float32)
        ij = img_j
    else:
        hw = mask_i.shape
        mj = shift_to_frame(mask_j.astype(jnp.float32), corner_j, corner_i,
                            hw)
        ij = shift_to_frame(img_j, corner_j, corner_i, hw)
    both = mask_i.astype(jnp.float32) * mj
    n = jnp.sum(both)
    gi = rgb_to_gray(img_i) if img_i.ndim == 3 else img_i
    gj = rgb_to_gray(ij) if ij.ndim == 3 else ij
    denom = jnp.maximum(n, 1.0)
    return n, jnp.sum(gi * both) / denom, jnp.sum(gj * both) / denom


def gain_compensate(images: jnp.ndarray, masks: jnp.ndarray,
                    corners: jnp.ndarray, alpha: float = 0.01,
                    beta: float = 100.0, shared_frame: bool = False):
    """Per-image gains from batched warped canvases.

    images: (N, H, W, C) float32; masks: (N, H, W) bool; corners: (N, 2)
    int32. Returns (gains (N,), images * gains).
    """
    N = images.shape[0]
    if N == 1:
        return jnp.ones((1,), jnp.float32), images

    idx_i, idx_j = [], []
    for i in range(N):
        for j in range(N):
            if i != j:
                idx_i.append(i)
                idx_j.append(j)
    ii = jnp.asarray(idx_i, jnp.int32)
    jj = jnp.asarray(idx_j, jnp.int32)

    def one(i, j):
        return _pair_stats(images[i], masks[i], corners[i],
                           images[j], masks[j], corners[j], shared_frame)

    n_p, Iij, Iji = jax.vmap(one)(ii, jj)   # (P,) each, P = N(N-1)

    A = jnp.zeros((N, N), jnp.float32)
    b = jnp.zeros((N,), jnp.float32)
    b = b.at[ii].add(beta * n_p)
    A = A.at[ii, ii].add(beta * n_p + 2.0 * alpha * Iij * Iij * n_p)
    A = A.at[ii, jj].add(-2.0 * alpha * Iij * Iji * n_p)

    gains = jnp.linalg.solve(A, b)
    gains = jnp.where(jnp.all(jnp.isfinite(gains)), gains,
                      jnp.ones_like(gains))
    out = images * gains[:, None, None, None]
    return gains, out
