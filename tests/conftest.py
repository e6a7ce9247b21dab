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
#
# The cache dir is keyed by a HOST-CPU fingerprint: XLA:CPU stores AOT
# code compiled for the build host's exact feature set, and loading an
# entry from a machine with different features only WARNS before
# executing — observed as a fatal SIGILL/abort mid-suite when the repo
# moved hosts between rounds. A per-CPU subdirectory makes stale entries
# unreachable instead of fatal.
def _cpu_fingerprint() -> str:
    import hashlib
    import platform

    tag = platform.machine()
    try:
        # flags alone miss model-dependent LLVM tuning (+prefer-no-gather
        # etc. vary by CPU model with identical flag lines)
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    tag += line
                if line.startswith(("flags", "Features")):
                    break
    except OSError:
        tag += platform.processor()
    return hashlib.md5(tag.encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache", _cpu_fingerprint()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
