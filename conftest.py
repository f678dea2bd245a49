"""Test harness configuration.

Tests run on CPU with a virtual 8-device platform (standing in for a TPU
mesh) and 64-bit precision enabled so the numerics can be validated against
the float64 oracle.  The container environment pins JAX_PLATFORMS=axon (the
real TPU relay), so the platform must be overridden via jax.config after
import, before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
