"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy (CPU-only ctest,
.github/workflows/ubuntu.yml) while additionally exercising our multi-chip
sharding paths via --xla_force_host_platform_device_count.

The container's sitecustomize eagerly registers the tunneled single-chip
TPU ("axon") PJRT plugin in every interpreter, which locks the platform
before conftest runs. Tests must be CPU (x64 + virtual 8-device mesh), so
if the trigger env var is present we re-exec the whole pytest process with
it scrubbed — the fresh interpreter then never registers the TPU plugin.
"""

import os

# The CPU re-exec itself lives in glomap_tpu_testhooks.py (loaded via
# addopts `-p glomap_tpu_testhooks` before pytest's capture starts — a
# conftest-time execve would write into capture temp files).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Solver-state accuracy: the reference runs Ceres in float64; our tests
# validate the same numerical envelope in x64 on CPU. TPU runs use f32
# (configured per-run, see glomap_tpu/config.py).
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: keeps repeated pytest runs fast. On SOME
# container hosts the XLA:CPU executable serializer segfaults inside
# put_executable_and_time (observed round 5, deterministic; distinct
# from the stale-cache loader segfault in CLAUDE.md) — set
# GLOMAP_TEST_NO_CACHE=1 to run without the cache.
if not os.environ.get("GLOMAP_TEST_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
