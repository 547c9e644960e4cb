"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (hence top of conftest).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-appends itself to jax_platforms at import time,
# overriding the env var; pin the config explicitly to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
