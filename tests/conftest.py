"""Test configuration: run everything on a virtual 8-device CPU mesh.

XLA_FLAGS must be set before the CPU backend initialises; the platform
choice must go through jax.config (the dev box's axon TPU-tunnel plugin
overrides the JAX_PLATFORMS environment variable).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("LBM_TEST_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", False)
