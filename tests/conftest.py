"""Test config: force an 8-device virtual CPU backend before JAX initializes.

This is the idiomatic JAX trick for testing multi-device sharding without
hardware (reference never used it; see SURVEY.md §4). Real-TPU kernel checks
live in bench.py, not the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The container's sitecustomize pins jax_platforms to the TPU tunnel; the
# config knob (not the env var) is what wins, so set it too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
