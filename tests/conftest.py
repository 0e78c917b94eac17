"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding logic is validated on host CPU devices
(xla_force_host_platform_device_count), per the reference test strategy gap
analysis (SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# hard-override: the ambient environment pins JAX_PLATFORMS to a TPU backend
# (a sitecustomize registers the PJRT plugin at interpreter start), so the env
# var alone is not enough -- update the config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the slow tier is compile-dominated (full
# model jits), and its HLO is identical across suite runs -- cache hits cut
# the repeat-run wall clock to the execute cost (VERDICT r4 #8).  Keys are
# HLO fingerprints, so source changes invalidate exactly the affected jits.
# Override the location with CODA_JAX_TEST_CACHE=<dir> (empty string disables).
_cache_dir = os.environ.get("CODA_JAX_TEST_CACHE", "/tmp/coda_jax_pytest_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
