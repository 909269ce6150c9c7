"""Gain exposure compensation.

TPU-native equivalent of OpenCV's ExposureCompensator::GAIN, which the
reference driver feeds with warped images + corners and applies per image
(ref 特征点检测.cpp:1114-1121). The Brown-Lowe gain model: one scalar gain
per image minimizing, over all overlapping pairs,

   Σ_ij N_ij [ α (g_i Ī_ij − g_j Ī_ji)² + β (1 − g_i)² ]

(α = error weight 0.01, β = prior weight 100 — OpenCV's constants), solved
as an N×N linear system. Only i≠j pairs contribute: measured against
cv2 5.0's GainCompensator (tests/test_opencv_parity.py), the self pair
i==j contributes NOTHING — adding a β·area_i self prior (as round-1 advice
suggested) shifts the gains by >10% away from OpenCV's.

Overlap statistics are computed entirely on device. The pair loop is
UNROLLED in Python over the (small, static) image count: a vmapped
`images[i]` index gather lowers to an XLA while-loop that copies the full
canvas per pair (measured 29 ms/stitch at 1080p — the single hottest op in
the round-1 pipeline); the unrolled form is pure fused multiply-reduces.
"""

from __future__ import annotations

import jax.numpy as jnp

from imagestitch_tpu.blend.frame import shift_to_frame
from imagestitch_tpu.ops.image import rgb_to_gray


def gain_compensate(images: jnp.ndarray, masks: jnp.ndarray,
                    corners: jnp.ndarray, alpha: float = 0.01,
                    beta: float = 100.0, shared_frame: bool = False):
    """Per-image gains from batched warped canvases.

    images: (N, H, W, C) float32; masks: (N, H, W) bool; corners: (N, 2)
    int32. `shared_frame=True` skips the frame-alignment gathers (all
    canvases share one origin — the jitted pipeline's layout); the generic
    path re-gathers image j into i's frame per pair.
    Returns (gains (N,), images * gains).
    """
    N = images.shape[0]
    if N == 1:
        return jnp.ones((1,), jnp.float32), images

    m = masks.astype(jnp.float32)
    grays = rgb_to_gray(images) if images.ndim == 4 else images  # (N, H, W)

    # one (N, N) stats pass, unrolled over unordered pairs
    zero = jnp.float32(0.0)
    n_mat = [[zero] * N for _ in range(N)]   # overlap pixel counts
    s_mat = [[zero] * N for _ in range(N)]   # Σ gray_i over overlap(i, j)
    for i in range(N):
        for j in range(i + 1, N):
            if shared_frame:
                mj, gj = m[j], grays[j]
            else:
                hw = m[i].shape
                mj = shift_to_frame(m[j], corners[j], corners[i], hw)
                gj = shift_to_frame(grays[j], corners[j], corners[i], hw)
            both = m[i] * mj
            n_mat[i][j] = n_mat[j][i] = jnp.sum(both)
            s_mat[i][j] = jnp.sum(grays[i] * both)
            s_mat[j][i] = jnp.sum(gj * both)

    n_p = jnp.stack([jnp.stack(r) for r in n_mat])          # (N, N)
    s_p = jnp.stack([jnp.stack(r) for r in s_mat])          # (N, N)
    I = s_p / jnp.maximum(n_p, 1.0)                         # Ī_ij

    # OpenCV GainCompensator accumulation (exposure_compensate.cpp), over
    # j ≠ i only (self pairs verified to contribute nothing, see module doc):
    #   b_i    += β N_ij
    #   A_ii   += β N_ij + 2α Ī_ij² N_ij
    #   A_ij   -= 2α Ī_ij Ī_ji N_ij
    off = 1.0 - jnp.eye(N, dtype=jnp.float32)
    b = beta * jnp.sum(n_p, axis=1)
    diag = (beta * jnp.sum(n_p, axis=1)
            + 2.0 * alpha * jnp.sum(I * I * n_p * off, axis=1))
    A = jnp.diag(diag) - 2.0 * alpha * I * I.T * n_p * off

    gains = jnp.linalg.solve(A, b)
    gains = jnp.where(jnp.all(jnp.isfinite(gains)), gains,
                      jnp.ones_like(gains))
    out = images * gains[:, None, None, None]
    return gains, out
