"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on fake CPU devices via
``--xla_force_host_platform_device_count`` (the standard JAX trick; the
reference has no distributed tests at all — SURVEY.md §4).

This environment ships a sitecustomize that imports jax and registers a
remote-TPU PJRT backend at interpreter startup — before conftest runs — which
pins everything to one remote chip and defeats a plain JAX_PLATFORMS env var.
jax.config.update('jax_platforms', ...) still wins as long as no backend has
been initialized yet, so we apply it here, before any test imports jax
arrays.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache (same store the CLIs default to): the suite
# spends most of its wall time in CPU compiles, and cache keys include the
# backend + compile options, so CPU-mesh test entries coexist with the CLIs'
# TPU entries.  First run populates; subsequent runs are much faster.
from mdctgan_tpu.parallel.mesh import enable_compilation_cache  # noqa: E402

_CACHE = os.path.expanduser("~/.cache/mdctgan_tpu_xla")
enable_compilation_cache(_CACHE)
# env-var form so SUBPROCESSES (multihost test workers, CLI smoke runs)
# share the cache too
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _scrub_perf_ab_env(monkeypatch):
    """The perf A/B hooks (CLAUDE.md) are trace-time env overrides; a value
    left over from an A/B shell session must not leak into tests that
    construct specific conv forms."""
    monkeypatch.delenv("MDCTGAN_UPSAMPLE_METHOD", raising=False)
    monkeypatch.delenv("MDCTGAN_HEAD_PHASES", raising=False)
    monkeypatch.delenv("MDCTGAN_DILATED_VJP", raising=False)
    monkeypatch.delenv("MDCTGAN_BN_VJP", raising=False)
    monkeypatch.delenv("MDCTGAN_ATTN_F64", raising=False)
