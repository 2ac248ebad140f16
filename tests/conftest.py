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


@pytest.fixture(autouse=True)
def _reset_code_scale():
    """Keep the process-global code scale clean between tests."""
    import physicl_tpu as phys

    yield
    for u in ("s", "m", "kg", "A", "K", "mol", "cd"):
        phys.reset_code_scale(u)
    phys.light.refresh_constants()
