"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding (mesh/pjit/shard_map) is exercised without TPU hardware, per the
standard JAX testing recipe.  This environment pre-registers a TPU PJRT
plugin via sitecustomize and overrides JAX_PLATFORMS after config init, so
the platform must be forced through jax.config (which wins over the env var).
Must run before any test module uses jax.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

sys.path.insert(0, os.path.dirname(__file__))
