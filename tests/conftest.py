"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run against
xla_force_host_platform_device_count=8. Must run before any jax import.
"""

import os

# This image preloads jax at interpreter startup via sitecustomize, so env
# vars set here are too late for config defaults; jax.config.update works.
# XLA_FLAGS is read lazily at CPU client creation, so setting it here is
# still effective as long as no computation ran yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
