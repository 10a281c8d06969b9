"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise pjit/shard_map collectives without
TPU pod hardware (SURVEY.md §4): the env vars must be set before jax
initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent XLA compilation cache: most of the suite's wall-clock is CPU
# compiles of the same programs every run; with a warm cache a full run
# drops to roughly its pure-execution time.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# The axon sitecustomize hook forces jax_platforms="axon,cpu" at interpreter
# start; override it before any backend initializes so tests run on the
# virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
