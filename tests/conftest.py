"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the driver's multichip dry-run environment: sharding/pjit code paths
compile and execute against 8 host devices without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and calls
# jax.config.update("jax_platforms", "axon,cpu"), which wins over env vars —
# force CPU back for the unit-test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
