"""Test configuration: force an 8-device virtual CPU mesh.

The container pins ``JAX_PLATFORMS=axon`` (the real-TPU tunnel) at
interpreter startup, so we must override the platform through jax.config —
env setdefault is a no-op here. XLA_FLAGS is read at (lazy) backend init,
which happens after conftest import. This is the standard JAX trick for
testing multi-chip sharding without hardware (SURVEY.md section 4, item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
