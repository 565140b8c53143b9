"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are validated
on a virtual 8-device CPU mesh (SURVEY.md §4 "Distributed tests without a
cluster"). Env vars must be set before JAX is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin's sitecustomize can override JAX_PLATFORMS; force the
# CPU backend explicitly (config wins over the plugin).
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeat suite runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/witw_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
