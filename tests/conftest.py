"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initialises.
"""

import os

# force CPU regardless of the ambient platform (the dev box presets
# JAX_PLATFORMS to the TPU tunnel); override with LBM_TEST_PLATFORM
os.environ["JAX_PLATFORMS"] = os.environ.get("LBM_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
