"""Test configuration: virtual 8-device CPU mesh with f64 enabled.

XLA_FLAGS must be set before the CPU backend initializes; the platform
selection must use jax.config (the axon TPU plugin overrides the
JAX_PLATFORMS environment variable).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles many small variants of
# the same programs; caching makes reruns fast on the single-core runner.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
