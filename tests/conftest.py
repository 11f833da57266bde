"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware.

The axon sitecustomize pins jax to the TPU platform regardless of
JAX_PLATFORMS, so the platform is also forced via jax.config here."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The suite is XLA-compile-dominated (~2/3 of wall time); persist compiled
# executables across runs. Keyed on program + compiler version, so stale
# entries can't produce wrong results — at worst a recompile.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("LMIC_TEST_XLA_CACHE", "/tmp/lmic_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
