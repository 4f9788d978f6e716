"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU for the test suite (the environment presets JAX_PLATFORMS to
# the TPU backend plugin, which ignores the env var); set TTIRT_TEST_TPU=1
# to run the suite on the real chip.
if not os.environ.get("TTIRT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
