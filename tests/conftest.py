"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI, so all sharding tests run
against a virtual 8-device CPU mesh. Kernel/solver numerics are identical
between CPU and TPU at the jnp level; TPU-only paths (Pallas) run in
interpreter mode on CPU.

Note: the environment's TPU plugin re-registers itself at interpreter
startup and overrides ``JAX_PLATFORMS``, so the platform must be forced via
``jax.config`` after import as well.
"""

import os

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


@pytest.fixture
def rng():
    return np.random.default_rng(42)
