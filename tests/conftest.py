"""Test configuration: force an 8-device virtual CPU mesh.

Tests must not depend on TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (``--xla_force_host_platform_device_count=8``), as SURVEY.md
§4 prescribes. The axon TPU plugin registers itself at interpreter startup
(sitecustomize) and overrides JAX_PLATFORMS, so we override back via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the fused env step is a large graph; caching
# makes repeat test runs start in seconds instead of minutes
jax.config.update("jax_compilation_cache_dir", "/tmp/isaacgym_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
