"""Fresh-process warm-start first call, used by bench.py.

Measures the framework's DEPLOY-path startup: deserialize the AOT stitch
blob (imagestitch_tpu.aot), compile (persistent-executable-cache hit), and
run one real stitch — in a process that has never traced the pipeline.
The tunnel bootstrap (first readback of a fresh process; environmental,
70-500 s observed) is paid on a trivial program before timing, exactly as
bench.py does for its own numbers.

Prints ONE JSON line: {"warm_start_s": ..., "was_cached": ...,
"h_valid": ...}. Run as:  python tools/warm_start_probe.py <H> <W>
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
    pano, valid, corner, metrics = call(a1, a2, key)
    s = float(pano.sum())  # readback = completion barrier
    dt = time.perf_counter() - t0
    print(json.dumps({
        "warm_start_s": round(dt, 2),
        "was_cached": bool(was_cached),
        "h_valid": bool(metrics["h_valid"]),
        "pano_sum": s,
    }))


if __name__ == "__main__":
    main()
