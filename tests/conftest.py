"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-device sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

# force CPU regardless of the shell's JAX_PLATFORMS (the host exports the
# TPU platform); override with UCSA_TEST_PLATFORM if needed
_platform = os.environ.get("UCSA_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices time-slice this single-core host: a heavy per-device
    # program (DeepLab fwd+bwd) can keep some devices from reaching a psum
    # within XLA:CPU's default 40 s rendezvous termination window, which
    # aborts the process. Harmless on real multi-core/multi-chip systems.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

# jax may already be imported by pytest plugin discovery, freezing the env
# defaults — update the live config too (backend must not be initialized yet)
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
