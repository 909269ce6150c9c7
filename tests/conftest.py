"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (the driver separately dry-run-compiles the
multi-chip path; see __graft_entry__.dryrun_multichip).

Note: the environment pins JAX_PLATFORMS=axon via sitecustomize, so a plain
env-var setdefault is not enough — we override the env AND the jax config
before any backend initializes.
"""

import os
import resource

os.environ["JAX_PLATFORMS"] = "cpu"
# the environment's persistent compilation cache segfaults inside
# put_executable_and_time when serializing large executables (observed on
# the fixed-N chain program); tests don't benefit from it anyway
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
# XLA:CPU's LLVM passes recurse deeply on the large fused detect/stitch
# programs; with the default 8 MB main-thread stack long pytest sessions
# intermittently die with SIGSEGV inside backend_compile_and_load. The hard
# limit here is unlimited — raise the soft limit so the kernel can keep
# growing the main stack.
resource.setrlimit(resource.RLIMIT_STACK,
                   (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# the suite is compile-dominated (one monolithic stitch program is ~40 s of
# LLVM at default opt on this CPU, ~21 s at O0, and most programs run only a
# handful of times); O0 halves suite compile time for ~1 s/run slowdown
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# the env var alone does not flip this flag in this jax build; the config
# update does (see the segfault note above)
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Free compiled executables between test modules.

    Long single-process runs accumulate XLA:CPU executables; past a
    threshold the NEXT compilation dies with SIGSEGV inside
    backend_compile_and_load (jaxlib CPU backend bug — reproducible with or
    without the axon plugin, stack rlimit raised, persistent cache
    disabled, AND at --xla_backend_optimization_level=0, so the trigger is
    live-executable count/footprint, not LLVM pass recursion; each module
    passes in isolation). Clearing JAX's jit caches after every module
    keeps the live executable count bounded and the suite stable, at the
    cost of recompiling shared programs across module boundaries — the
    per-module recompiles are cheap at O0, and tests are structured to
    share executables WITHIN a module (see test_pipeline's docstring).

    Characterization attempts (tools/repro_xla_cpu_segfault.py): 2000
    distinct small programs and 400 distinct conv/scan programs both
    survive in one process (3.2 GB / 1.0 GB RSS), so plain executable
    count/footprint does NOT reproduce it — the trigger is specific to
    this suite's giant fused stitch programs.

    ISTPU_NO_CLEAR_CACHES=1 disables the workaround (experiment knob).
    Last tried 2026-08-18 with the O0/vectorized-detector suite: the
    no-clear run still dies mid-session with the faulthandler SIGSEGV
    dump — the workaround remains load-bearing."""
    yield
    if not os.environ.get("ISTPU_NO_CLEAR_CACHES"):
        jax.clear_caches()
