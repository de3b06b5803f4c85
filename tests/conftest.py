"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run anywhere (the idiomatic JAX stand-in for a fake collective
backend — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TPAT_DISABLE_NATIVE", "0")

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin before conftest
# runs, which overrides JAX_PLATFORMS — force the CPU platform explicitly so
# unit tests never dispatch over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the test suite: the tiny-model jits are
# identical across runs, so re-runs skip most XLA compiles.
os.makedirs("/tmp/jax_cache_tests", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
