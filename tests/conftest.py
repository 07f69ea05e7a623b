"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (SURVEY.md §4).

The TPU plugin in this environment ignores the JAX_PLATFORMS env var, so we
force the CPU backend through jax.config before any backend initializes —
this keeps tests fast (no tunneled-TPU compiles) and deterministic."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (interpret-mode fuzzes)")


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow unless --runslow / MIL_RUN_SLOW=1: the two
    interpret-mode fuzz tests cost ~8 min single-core — more than the
    rest of the suite combined (round-3 verdict weak #6). They still run
    in CI-style full passes via MIL_RUN_SLOW=1."""
    if config.getoption("--runslow") or os.environ.get("MIL_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow / MIL_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
