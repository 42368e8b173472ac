"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` per the standard JAX recipe.  Must
run before jax is imported anywhere.
"""

import os

# Hard-set (the ambient environment points JAX at the one real TPU chip via
# JAX_PLATFORMS=axon; tests must be hermetic + multi-device).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8


@pytest.fixture
def mesh8():
    return jax.sharding.Mesh(np.array(jax.devices()).reshape(8), ("data",))


@pytest.fixture
def rng():
    return np.random.default_rng(215)
