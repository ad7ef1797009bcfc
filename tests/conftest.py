"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
(pjit over a Mesh) is exercised without TPU hardware.

NOTE: this image pre-registers the TPU ('axon') backend from sitecustomize
BEFORE user code runs, so JAX_PLATFORMS env vars are ignored; the reliable
override is jax.config.update('jax_platforms', ...) before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("NEXUS_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
