"""Micro-experiment: per-keypoint window extraction strategies on TPU.

The SIFT orientation/descriptor stages gather ~1.8M scattered elements per
image (25x25 and 17x17 windows around ~1500 keypoints from the per-scale
gradient stacks); profile_sift attributes ~12 ms of the 30 ms detect to
them. Compares, at 1080p octave-0 scale:

  A  flat per-element gather (the descriptor stage's formulation)
  B  vmap(lax.dynamic_slice) per keypoint (slice-gather lowering)
  C  flat per-element gather in bfloat16 (half the bytes)

Prints median ms for each over the same (K, P) work.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def median_ms(fn, lat, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


def main():
    S, H, W = 4, 1080, 1920
    K = 768          # keypoints per image across octaves (worst octave 0)
    R = 12
    P = (2 * R + 1) ** 2

    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.standard_normal((S, H, W)), jnp.float32)
    si = jnp.asarray(rng.integers(0, S, K), jnp.int32)
    yk = jnp.asarray(rng.integers(R, H - R, K), jnp.int32)
    xk = jnp.asarray(rng.integers(R, W - R, K), jnp.int32)

    trivial = jax.jit(lambda x: jnp.sum(x))
    z = jnp.ones((8,), jnp.float32)
    float(trivial(z))
    lat = median_ms(lambda: float(trivial(z)), 0.0, reps=9) / 1e3
    print(f"tunnel latency {lat*1e3:.1f} ms  backend={jax.default_backend()}",
          file=sys.stderr)

    vs, us = np.mgrid[-R:R + 1, -R:R + 1]
    dv = jnp.asarray(vs.reshape(-1), jnp.int32)
    du = jnp.asarray(us.reshape(-1), jnp.int32)

    @jax.jit
    def flat_gather(stack, si, yk, xk):
        flatv = stack.reshape(-1)
        yi = jnp.clip(yk[:, None] + dv[None, :], 0, H - 1)
        xi = jnp.clip(xk[:, None] + du[None, :], 0, W - 1)
        g = flatv[(si[:, None] * H + yi) * W + xi]
        return jnp.sum(g * g)

    @jax.jit
    def slice_gather(stack, si, yk, xk):
        def one(s, y, x):
            w = lax.dynamic_slice(
                stack, (s, y - R, x - R), (1, 2 * R + 1, 2 * R + 1))
            return jnp.sum(w * w)
        return jnp.sum(jax.vmap(one)(si, yk, xk))

    stack_bf = stack.astype(jnp.bfloat16)

    @jax.jit
    def flat_gather_bf16(stack, si, yk, xk):
        flatv = stack.reshape(-1)
        yi = jnp.clip(yk[:, None] + dv[None, :], 0, H - 1)
        xi = jnp.clip(xk[:, None] + du[None, :], 0, W - 1)
        g = flatv[(si[:, None] * H + yi) * W + xi].astype(jnp.float32)
        return jnp.sum(g * g)

    for name, fn in (
            ("A flat gather f32", lambda: float(flat_gather(stack, si, yk, xk))),
            ("B vmap dynamic_slice", lambda: float(slice_gather(stack, si, yk, xk))),
            ("C flat gather bf16", lambda: float(flat_gather_bf16(stack_bf, si, yk, xk)))):
        t0 = time.perf_counter()
        fn()
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ms = median_ms(fn, lat)
        print(f"{name}: {ms:.2f} ms  ({K}x{P} window elems)", file=sys.stderr)


if __name__ == "__main__":
    main()
