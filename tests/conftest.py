"""Test config: force the CPU backend with 8 virtual devices.

The container pre-imports JAX at interpreter startup with a tunneled TPU
('axon') platform; JAX_PLATFORMS in the environment is already set, so we
must override the config directly before any backend is initialized.
Sharding tests use an 8-device virtual CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: chip kernels recompile only when their
# computation fingerprint changes, not on every test run.
os.makedirs("/root/.cache/ziren_jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/ziren_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
