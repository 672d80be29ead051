"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on fake CPU devices via
``--xla_force_host_platform_device_count`` (the standard JAX trick; the
reference has no distributed tests at all — SURVEY.md §4).  This must run
before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
