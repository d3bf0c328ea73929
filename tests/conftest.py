"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise a multi-chip mesh without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

import pytest  # noqa: E402

# Belt and braces: the surrounding environment exports JAX_PLATFORMS=axon
# (the tunneled TPU); tests must run on the 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: scan-heavy trainer configs compile once and
# are reused across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
