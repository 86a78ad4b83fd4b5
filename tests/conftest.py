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
