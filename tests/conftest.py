"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware (`shard_map` over a virtual mesh compiles and
runs identically; only speed differs).  Must be set before jax import.
"""
import os

# Belt: env vars for a clean interpreter...
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# ...and suspenders: the sandbox's sitecustomize imports jax at interpreter
# startup (registering the TPU tunnel backend), which latches JAX_PLATFORMS
# before this file runs — override via jax.config, which wins either way.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The suite is XLA-compile-bound (interpret-mode Pallas + 8-way shard_map
# programs), so cache compilations on disk: a warm rerun of the quick tier
# drops from minutes to seconds.  Keyed on backend + jaxlib version, so a
# toolchain bump invalidates cleanly; delete the dir to force cold builds.
jax.config.update("jax_compilation_cache_dir", "/tmp/fsc_tpu_jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_padded(rng, n, lo=-1.0, hi=1.0):
    """A random float32 (n+2, n+2) grid."""
    return rng.uniform(lo, hi, size=(n + 2, n + 2)).astype(np.float32)


@pytest.fixture
def grid_factory(rng):
    def make(n, lo=-1.0, hi=1.0):
        return random_padded(rng, n, lo, hi)

    return make
