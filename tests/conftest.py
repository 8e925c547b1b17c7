"""Test harness configuration.

Tests run on the CPU backend with 8 virtual XLA host devices so that
multi-chip sharding (mesh + halo exchange) is exercised without TPU hardware.
These env vars must be set before jax is imported anywhere.
"""

import os
import sys

# Hard-set (not setdefault): the container pre-sets JAX_PLATFORMS=axon to
# route jax at the tunnelled TPU, which must not be touched by unit tests.
# The axon sitecustomize imports jax at interpreter boot, so the env var alone
# is not enough — jax.config must be updated before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def make_complex(rng, n, dtype=np.complex64):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(dtype)


@pytest.fixture
def cnoise():
    return make_complex


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration tests")
