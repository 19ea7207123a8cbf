"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend for every
Python process and sets JAX_PLATFORMS=axon, so plain env overrides are
not enough — we must update the JAX config before any jax computation.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Note: x64 stays OFF — the library targets TPU where 64-bit device types
# are unavailable; all host-side precision-critical math uses numpy float64.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.devices()[0].platform == "cpu"
