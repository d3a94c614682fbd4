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

# Persistent XLA compilation cache (round 4): the fast tier's cost is
# dominated by per-test jit compiles of distinct option-combo chunk
# programs; caching them on disk cuts warm reruns roughly in half
# (measured: the iso_ms_matrix group 23 s cold -> 10 s warm). Keyed by
# platform+program, so the CPU test cache coexists with the TPU bench
# cache. Override the location with SWIFTMP3_TPU_TEST_CACHE; wipe the
# directory to force cold compiles.
_cache_dir = os.environ.get(
    "SWIFTMP3_TPU_TEST_CACHE",
    os.path.expanduser("~/.cache/swiftmp3_tpu_xla_tests"),
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
