"""Test configuration: force CPU with an 8-device virtual mesh.

All tests run on CPU with 8 virtual devices so sharding/pjit paths can be
exercised without TPU hardware (SURVEY.md §4 multi-host test strategy).

NOTE: this container pre-imports jax at interpreter startup (sitecustomize
registers the axon TPU backend), so env vars alone are too late — we must go
through jax.config before any backend is initialized.
"""

import os

# Must be set before the CPU backend initializes (lazily, at first use).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
