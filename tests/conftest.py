"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-device sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

# force CPU regardless of the shell's JAX_PLATFORMS (the host exports the
# TPU platform); override with UCSA_TEST_PLATFORM if needed
_platform = os.environ.get("UCSA_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by pytest plugin discovery, freezing the env
# defaults — update the live config too (backend must not be initialized yet)
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
