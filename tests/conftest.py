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
