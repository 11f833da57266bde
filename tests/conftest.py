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
