"""Test configuration: run on a virtual 8-device CPU platform.

Must set the env vars before JAX initializes its backends, so this executes at
conftest import time (pytest loads conftest before any test module).
"""

import os

_ON_TPU = os.environ.get("PHYSICL_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

# The axon sitecustomize force-registers the TPU backend and overwrites
# jax_platforms at interpreter start; env vars alone don't stick. Re-pin to
# CPU before any backend is initialized so tests run on the virtual 8-device
# CPU platform. Set PHYSICL_TEST_TPU=1 to run the suite on attached TPUs
# instead (sharding tests then need >= 8 chips and may skip).
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (statistical sweeps, multiprocess, fuzz, "
        "250k-iteration clocks) — excluded from `make test-fast`")


def pytest_addoption(parser):
    parser.addoption(
        "--smoke", action="store_true", default=False,
        help="keep only the first two non-slow tests of each module: a "
             "<2-minute tier that still imports and executes every module "
             "(`make test-smoke`)")


def pytest_collection_modifyitems(config, items):
    if not config.getoption("--smoke"):
        return
    kept, dropped, per_module = [], [], {}
    for item in items:
        mod = item.location[0]
        n = per_module.get(mod, 0)
        if n < 2 and item.get_closest_marker("slow") is None:
            per_module[mod] = n + 1
            kept.append(item)
        else:
            dropped.append(item)
    items[:] = kept
    config.hook.pytest_deselected(items=dropped)


@pytest.fixture(autouse=True)
def _reset_code_scale():
    """Keep the process-global code scale clean between tests."""
    import physicl_tpu as phys

    yield
    for u in ("s", "m", "kg", "A", "K", "mol", "cd"):
        phys.reset_code_scale(u)
    phys.light.refresh_constants()
