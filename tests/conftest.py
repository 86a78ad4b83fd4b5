"""Test configuration: force an 8-device virtual CPU platform so tests
(including sharding tests) run anywhere without touching real TPU hardware.

Note the axon sitecustomize in this image registers a TPU plugin and forces
``jax_platforms=axon`` regardless of the environment variable, so we override
through jax.config after import — this must happen before any backend is
initialized, i.e. before test modules import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite accumulates hundreds of compiled CPU programs; on this
    jax build the XLA:CPU client segfaults inside backend_compile_and_load
    once enough executables are live (reproduced at ~60% of the suite;
    either half alone passes).  Releasing the jit caches between modules
    keeps the live-executable count bounded at the cost of recompiling
    the few helpers shared across modules.
    """
    yield
    jax.clear_caches()
