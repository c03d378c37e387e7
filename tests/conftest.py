"""Test harness: run everything on an 8-device virtual CPU mesh.

The reference had no fake-backend capability (SURVEY.md §4); here every
multi-chip code path is exercised on host CPU via
``--xla_force_host_platform_device_count``. Note the env on this machine pins
``JAX_PLATFORMS=axon`` (TPU tunnel) via sitecustomize, so the platform must be
overridden programmatically before the backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# parity tests compare fp32 numerics against torch CPU
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
