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
# dominate suite time otherwise). Harmless when cold. Host-fingerprint
# keying (utils/platform.enable_compile_cache) keeps stale cross-host
# XLA:CPU AOT entries unreachable instead of fatal (SIGILL mid-suite when
# the repo moved hosts between rounds).
import sys  # noqa: E402

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from attention_based_tbn_tpu.utils.platform import (  # noqa: E402
    enable_compile_cache,
)

enable_compile_cache(
    os.path.join(_REPO_ROOT, ".jax_cache"), min_compile_secs=1.0
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
