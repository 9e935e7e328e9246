"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding (mesh/pjit/shard_map) is exercised without TPU hardware, per the
standard JAX testing recipe.  Must run before `jax` is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
