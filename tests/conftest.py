"""Test configuration: CPU backend with 8 virtual devices + float64.

This is our "Reference platform" (SURVEY.md §4): the reference's tests pin
OpenMM's deterministic f64 Reference platform; ours pin the CPU JAX backend
with x64 enabled, and an 8-device virtual mesh for sharding tests. Must run
before jax is imported anywhere.
"""
import os

# NOTE: in this image JAX_PLATFORMS is preset (axon) and re-exporting it does
# not stick; jax.config.update('jax_platforms', ...) is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-dominated on the
# 1-core CI host (hundreds of small jitted step/energy functions), so warm
# reruns skip most of that. Local-only (gitignored) — cache artifacts are
# platform/version-specific. Harmless when cold.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
