"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding is validated without TPU hardware by faking 8 host
devices, per the project build rules.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep compilation times manageable in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (real TPU); tests run on the
# virtual 8-device CPU mesh instead.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU-backend compiles run locally, so the
# disk cache carries across pytest runs (the big SPMD train-step programs
# dominate suite time otherwise). Harmless when cold.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
