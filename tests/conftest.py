"""Test harness config: force CPU platform with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver validates real multi-chip
separately via __graft_entry__.dryrun_multichip).

NOTE: this environment pins JAX_PLATFORMS=axon via sitecustomize, so we must
override through jax.config (JAX_PLATFORMS env alone is clobbered)."""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
