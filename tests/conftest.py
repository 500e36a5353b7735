"""Test harness: run everything on CPU with 8 virtual devices so sharding
tests work without TPU hardware (the real chip is reserved for benchmarks).

Note: the environment pins JAX_PLATFORMS=axon via a site hook, so the env
var alone doesn't stick — jax.config.update is the authoritative override.
XLA_FLAGS must still be set before the CPU client is instantiated."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: this box has one CPU core, so repeat suite
# runs would otherwise re-pay every XLA compile.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
