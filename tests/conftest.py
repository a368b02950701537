"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

The reference relies on running the identical code path from 1 to 147k MPI
ranks (SURVEY.md §4); our analog is the XLA CPU backend with
xla_force_host_platform_device_count as the fake cluster.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via config
# so tests get float64 + the 8-device virtual cluster.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
