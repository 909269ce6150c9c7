"""Micro-experiment: channels-last vs planar canvas elementwise cost.

ROADMAP flags the (N, Hc, Wc, 3) compositing layout as a suspected
relayout/lane-padding tax (~13 ms/pair of reshape+bitcast fusions in the
pair-program trace). This measures a representative fused elementwise
chain (gain-scale + mask + weighted sum + abs-diff reduce, ~6 passes)
over the 2x1480x3456 canvas in both layouts, plus the same chain with a
leading gray reduction over channels.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_canvas_layout.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def median_ms(fn, lat, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


def main():
    N, H, W, C = 2, 1480, 3456, 3
    rng = np.random.default_rng(0)
    last = jnp.asarray(rng.uniform(0, 255, (N, H, W, C)), jnp.float32)
    planar = jnp.asarray(np.moveaxis(np.asarray(last), -1, 1))
    masks = jnp.asarray(rng.random((N, H, W)) > 0.3)

    trivial = jax.jit(lambda x: jnp.sum(x))
    z = jnp.ones((8,), jnp.float32)
    float(trivial(z))
    lat = median_ms(lambda: float(trivial(z)), 0.0, reps=9) / 1e3
    print(f"tunnel latency {lat*1e3:.1f} ms backend={jax.default_backend()}",
          file=sys.stderr)

    REPS = 16  # iterate inside ONE program: a single chain resolves below
    # the tunnel-latency measurement floor

    def body_last(x, m, i):
        g = jnp.sqrt(jnp.sum(x * x, axis=-1))            # gray reduce
        gains = 1.0 + 0.001 * i + 0.01 * jnp.arange(N, dtype=jnp.float32)
        y = x * gains[:, None, None, None]
        y = jnp.where(m[..., None], y, 0.0)
        w = g / (jnp.sum(g, axis=0) + 1.0)
        out = jnp.sum(y * w[..., None], axis=0)
        d = jnp.abs(y[0] - y[1])
        return out.sum() + d.sum()

    def body_planar(x, m, i):
        g = jnp.sqrt(jnp.sum(x * x, axis=1))             # gray reduce
        gains = 1.0 + 0.001 * i + 0.01 * jnp.arange(N, dtype=jnp.float32)
        y = x * gains[:, None, None, None]
        y = jnp.where(m[:, None], y, 0.0)
        w = g / (jnp.sum(g, axis=0) + 1.0)
        out = jnp.sum(y * w[:, None], axis=0)
        d = jnp.abs(y[0] - y[1])
        return out.sum() + d.sum()

    @jax.jit
    def chain_last(x, m):
        return jax.lax.fori_loop(
            0, REPS, lambda i, a: a + body_last(x, m,
                                                i.astype(jnp.float32)),
            jnp.float32(0.0))

    @jax.jit
    def chain_planar(x, m):
        return jax.lax.fori_loop(
            0, REPS, lambda i, a: a + body_planar(x, m,
                                                  i.astype(jnp.float32)),
            jnp.float32(0.0))

    for name, fn in (
            ("channels-last (N,H,W,3)",
             lambda: float(chain_last(last, masks))),
            ("planar (N,3,H,W)",
             lambda: float(chain_planar(planar, masks)))):
        t0 = time.perf_counter()
        fn()
        print(f"{name}: compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ms = median_ms(fn, lat) / REPS
        print(f"{name}: {ms:.2f} ms/chain ({REPS} chains/dispatch)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
