"""Binary-descriptor distance as an MXU matmul.

The reference matches descriptors with FLANN's approximate LSH index
(ref 特征点匹配.cpp CpuMatcher1::match :232-290). On TPU, EXACT Hamming
distance is cheaper than approximate search: with bits a, b ∈ {0,1},
popcount(a XOR b) = Σa + Σb − 2·a·b, so the full (N, M) distance matrix is
one (N,256)x(256,M) matmul on the MXU plus rank-1 corrections. bf16 inputs
are exact here (bit values and row sums ≤ 256 fit the bf16 mantissa) with
float32 accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def hamming_distance_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) float32 Hamming distances between (N, B) and (M, B) bit arrays.

    This is the hot kernel of the matching stage (replaces the FLANN 2-NN
    searches at ref :256, :277) — explicitly bf16 on the MXU.
    """
    a = d1.astype(jnp.bfloat16)
    b = d2.astype(jnp.bfloat16)
    dot = lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)                # (N, M)
    s1 = jnp.sum(d1.astype(jnp.float32), axis=1)           # (N,)
    s2 = jnp.sum(d2.astype(jnp.float32), axis=1)           # (M,)
    return s1[:, None] + s2[None, :] - 2.0 * dot


def l2_distance_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) squared-L2 distances between float descriptor sets — the SIFT
    counterpart of the Hamming kernel: |a|² + |b|² − 2·a·bᵀ with the cross
    term one bf16 MXU matmul (unit-normalized SIFT descriptors lose nothing
    to bf16 at matching precision)."""
    a = d1.astype(jnp.bfloat16)
    b = d2.astype(jnp.bfloat16)
    dot = lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    s1 = jnp.sum(d1.astype(jnp.float32) ** 2, axis=1)
    s2 = jnp.sum(d2.astype(jnp.float32) ** 2, axis=1)
    return jnp.maximum(s1[:, None] + s2[None, :] - 2.0 * dot, 0.0)
