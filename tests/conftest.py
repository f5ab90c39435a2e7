"""Test configuration: force an 8-device CPU platform so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4e).

Note: the environment's axon site hook pins JAX_PLATFORMS=axon, so the env
var alone is not enough — we must override via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the fused train-step compile is expensive on
# CPU; cache it across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
