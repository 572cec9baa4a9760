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

# Escape hatch for the once-per-round heavy kernel-parity tier: the fused
# 14/26/27-DOF kernels compile in seconds on the real TPU backend but cost
# tens of minutes in interpret mode on XLA:CPU, so the heavy tier is run as
#   ISAACGYM_TPU_TEST_PLATFORM=native ISAACGYM_TPU_HEAVY_TESTS=1 pytest ...
# ("native" leaves platform selection to the installed TPU plugin, which
# registers under its own name) and its log is committed
# (docs/runs/heavy_tier_r*.log). Everything else stays on the virtual
# 8-device CPU mesh.
_platform = os.environ.get("ISAACGYM_TPU_TEST_PLATFORM", "cpu")
if _platform != "native":
    jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the fused env step is a large graph; caching
# makes repeat test runs start in seconds instead of minutes
jax.config.update("jax_compilation_cache_dir", "/tmp/isaacgym_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
