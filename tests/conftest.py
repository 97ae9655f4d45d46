"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI; all sharding tests run against
XLA's host-platform device emulation. The environment may force a TPU
platform through sitecustomize (jax.config is already set to the tunnel
platform by the time conftest runs), so we must override jax.config itself
before any backend initializes — env vars alone are not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
