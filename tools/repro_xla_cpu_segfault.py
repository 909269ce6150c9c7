"""Standalone repro/characterization harness for the XLA:CPU segfault that
forces tests/conftest.py's per-module jax.clear_caches() workaround.

Observed in long pytest sessions: past some number of live compiled
executables, the NEXT compilation dies with SIGSEGV inside
backend_compile_and_load (with the persistent compilation cache disabled,
the stack rlimit raised, at --xla_backend_optimization_level=0, and with or
without the axon PJRT plugin loaded — see tests/conftest.py:51-67).

This script compiles DISTINCT programs in one process until it crashes or
reaches --max-programs, logging live-program count and RSS so the trigger
(count vs footprint) can be separated. Run it under `timeout` from a shell;
a SIGSEGV shows up as rc=139.

  python tools/repro_xla_cpu_segfault.py --max-programs 3000 --size small
  python tools/repro_xla_cpu_segfault.py --max-programs 300 --size large
  python tools/repro_xla_cpu_segfault.py --max-programs 3000 --clear-every 100

If --clear-every N keeps the run alive where the same settings without it
crash, the conftest workaround's theory (live-executable accumulation) is
confirmed and the threshold bounds how often the suite actually needs to
clear.

FINDINGS so far (jax 0.8.x, this container, single CPU core):
  --size small --max-programs 2000  -> SURVIVED, rss 3243 MB (~1.5 MB/prog)
  --size large --max-programs 400   -> SURVIVED, rss  975 MB (~2.4 MB/prog)
Neither plain-XLA workload reproduces the crash, so the trigger is NOT raw
live-executable count and NOT raw RSS: it is specific to the suite's giant
fused programs (full stitch pipelines with interpret-mode Pallas kernels,
hundreds of MB of compiled code each). The per-module clear_caches()
workaround in tests/conftest.py therefore stays; scoping it tighter would
require reproducing with real pipeline programs, which costs as much
compile time as the suite itself.
"""

from __future__ import annotations

import argparse
import os
import resource
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
resource.setrlimit(resource.RLIMIT_STACK,
                   (resource.RLIM_INFINITY, resource.RLIM_INFINITY))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def make_program(i: int, size: str):
    """A distinct program per i (the baked constant defeats cache reuse)."""
    c = np.float32(1.0 + i)
    if size == "small":
        def f(x):
            return (x @ x + c).sum() + jnp.tanh(x).sum()
        arg = jnp.ones((64, 64), jnp.float32)
    else:
        # closer to the suite's stitch programs: a few conv/matmul/scan
        # stages fused into one executable
        def f(x):
            y = x
            for _ in range(4):
                y = jnp.tanh(y @ y + c)
            def body(carry, row):
                return carry + jnp.maximum(row, carry), carry.sum()
            carry, outs = jax.lax.scan(body, y[0], y)
            return carry.sum() + outs.sum()
        arg = jnp.ones((256, 256), jnp.float32)
    return jax.jit(f), arg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-programs", type=int, default=3000)
    ap.add_argument("--size", choices=["small", "large"], default="small")
    ap.add_argument("--clear-every", type=int, default=0,
                    help="clear_caches() every N programs (0 = never)")
    ap.add_argument("--report-every", type=int, default=50)
    args = ap.parse_args()

    print(f"jax {jax.__version__} devices={len(jax.devices())} "
          f"size={args.size} clear_every={args.clear_every}", flush=True)
    keep = []  # keep the jitted callables alive, like a pytest session does
    for i in range(args.max_programs):
        f, arg = make_program(i, args.size)
        float(f(arg))  # compile + run
        keep.append(f)
        if args.clear_every and (i + 1) % args.clear_every == 0:
            jax.clear_caches()
            keep.clear()
        if (i + 1) % args.report_every == 0:
            print(f"programs={i + 1} rss={rss_mb():.0f}MB", flush=True)
    print(f"SURVIVED {args.max_programs} programs rss={rss_mb():.0f}MB",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
