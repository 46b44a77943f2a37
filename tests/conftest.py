"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device CPU mesh — the
TPU-native answer to "test multi-node without a cluster" (SURVEY §4).

This environment registers a TPU ("axon") PJRT plugin via sitecustomize and
pins JAX_PLATFORMS=axon, so plain env vars are not enough: we override the
platform through jax.config before any backend is initialized.  torch is
pinned to one thread so its pool doesn't starve XLA compiles (single-core CI).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Shared persistent jit cache: the suite is compile-dominated on this
# single-core container; repeat runs should skip recompiles entirely.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass

try:
    import torch  # noqa: E402

    torch.set_num_threads(1)
except ImportError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _check_cpu():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
