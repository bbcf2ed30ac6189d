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

# Persistent compilation cache: most of the suite's wall time is XLA CPU
# compilation of the scanned model graphs, which are identical run to run.
# With a warm cache the full suite drops from ~24 min to a few minutes on
# this 2-core host. The directory is gitignored; safe to delete any time.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
