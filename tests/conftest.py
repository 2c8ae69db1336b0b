"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon, so env vars alone don't switch platforms; we override via
jax.config before any backend initializes (backends are lazy).  The same code
jits on TPU unchanged.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
