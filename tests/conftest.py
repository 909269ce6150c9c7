"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (the driver separately dry-run-compiles the
multi-chip path; see __graft_entry__.dryrun_multichip).

Note: the environment pins JAX_PLATFORMS=axon via sitecustomize, so a plain
env-var setdefault is not enough — we override the env AND the jax config
before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
