"""Fresh-process warm-start first call, used by bench.py.

Measures the framework's DEPLOY-path startup: deserialize the AOT stitch
blob (imagestitch_tpu.aot), compile (persistent-executable-cache hit), and
run one real stitch — in a process that has never traced the pipeline.
The tunnel bootstrap (first readback of a fresh process; environmental,
70-500 s observed) is paid on a trivial program before timing, exactly as
bench.py does for its own numbers.

Prints ONE JSON line with the total and its breakdown:
  warm_start_s   = deserialize_s + first dispatch (compile + run + readback)
  deserialize_s  blob read + jax.export.deserialize
  compile_s      first dispatch minus a second (executable-cached) dispatch
                 — the persistent-executable-cache hit cost
  run_s          the second dispatch (pure run + readback)
Run as:  python tools/warm_start_probe.py <H> <W>
"""

import json
import sys
import time


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920

    import jax
    import jax.numpy as jnp

    float(jax.jit(lambda x: x.sum())(jnp.ones((8,))))  # tunnel bootstrap

    from imagestitch_tpu import aot
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.utils.io import synthetic_pair

    i1, i2, _ = synthetic_pair(h, w, overlap=0.4, seed=0)
    a1 = jnp.asarray(i1, jnp.float32)
    a2 = jnp.asarray(i2, jnp.float32)
    key = jax.random.key(0)
    jax.block_until_ready((a1, a2))

    t0 = time.perf_counter()
    call, was_cached = aot.stitch_pair_program(h, w, PipelineConfig())
    t1 = time.perf_counter()
    pano, valid, corner, metrics = call(a1, a2, key)
    s = float(pano.sum())  # readback = completion barrier
    t2 = time.perf_counter()
    # second dispatch hits the in-process executable: its time is the pure
    # run+readback, so first-minus-second isolates the compile cost
    pano2, _, _, _ = call(a1, a2, key)
    float(pano2.sum())
    t3 = time.perf_counter()
    print(json.dumps({
        "warm_start_s": round(t2 - t0, 2),
        "deserialize_s": round(t1 - t0, 3),
        "compile_s": round(max((t2 - t1) - (t3 - t2), 0.0), 2),
        "run_s": round(t3 - t2, 3),
        "was_cached": bool(was_cached),
        "h_valid": bool(metrics["h_valid"]),
        "pano_sum": s,
    }))


if __name__ == "__main__":
    main()
