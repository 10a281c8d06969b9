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

import jax  # noqa: E402

# The axon sitecustomize hook forces jax_platforms="axon,cpu" at interpreter
# start; override it before any backend initializes so tests run on the
# virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
