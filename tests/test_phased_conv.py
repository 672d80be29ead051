"""Column-phased conv (models/layers.py Conv(phases>1)) equivalence tests.

The phased path must be bit-compatible in its PARAMETER TREE with the dense
path (checkpoint import/export unaffected) and numerically equivalent in
forward and both gradients, including every fallback (small batch, odd
width, strides).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdctgan_tpu.models.layers import Conv, ConvResBlock, ResnetBlock, auto_phases


def _max_err(a, b):
    return float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b))))


@pytest.mark.parametrize(
    "kernel,stride,padding,phases,width",
    [
        (3, 1, 1, 2, 32),   # resblock geometry
        (5, 1, 2, 2, 32),   # ConvResBlock conv2
        (7, 1, 0, 2, 39),   # stem geometry (pre-padded by reflect outside)
        (3, 1, 1, 4, 32),
        (4, 2, 2, 2, 30),   # strided (w_out 16)
        (3, 1, 1, 2, 31),   # odd output width -> pad-and-crop path
        (4, 2, 2, 2, 28),   # strided + odd w_out (15) -> pad-and-crop
        (3, 1, 1, 4, 33),   # w_out 33 = 4k+1 -> pad-and-crop
    ],
)
def test_phased_conv_matches_dense(rng, kernel, stride, padding, phases, width):
    x = jnp.asarray(rng.standard_normal((8, 14, width, 6)), jnp.float32)
    dense = Conv(12, kernel, stride, padding, phases=1)
    phased = Conv(12, kernel, stride, padding, phases=phases)
    params = dense.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (checkpoint compatibility)
    assert jax.tree.structure(params) == jax.tree.structure(
        phased.init(jax.random.PRNGKey(0), x)
    )
    assert _max_err(dense.apply(params, x), phased.apply(params, x)) < 1e-5

    def loss(m, p, xx):
        return jnp.sum(m.apply(p, xx) ** 2)

    g0 = jax.grad(loss, argnums=(1, 2))(dense, params, x)
    g1 = jax.grad(loss, argnums=(1, 2))(phased, params, x)
    errs = jax.tree.leaves(jax.tree.map(_max_err, g0, g1))
    assert max(errs) < 1e-3  # fp32 accumulation-order noise only


def test_polyphase_head_2d_matches_dense(rng):
    """The tanh-head PolyphaseConv switches to 2-D (4x8) phasing at train
    batches; both regimes must equal the plain dense conv, with matching
    parameter trees and gradients."""
    from mdctgan_tpu.models.layers import PolyphaseConv

    x8 = jnp.asarray(rng.standard_normal((8, 22, 38, 6)), jnp.float32)
    # out (8, 16, 32, 1): 16%4==0, 32%8==0; 2-D is opt-in (phases_h>1)
    head = PolyphaseConv(1, 7, phases_h=4, phases_w=8)
    dense = Conv(1, 7)
    params = dense.init(jax.random.PRNGKey(0), x8)
    assert jax.tree.structure(params) == jax.tree.structure(
        head.init(jax.random.PRNGKey(0), x8)
    )
    for xx in (x8, x8[:2]):  # 2-D path and small-batch 1-D path
        assert _max_err(dense.apply(params, xx), head.apply(params, xx)) < 1e-5

    def loss(m, p, xx):
        return jnp.sum(m.apply(p, xx) ** 2)

    g0 = jax.grad(loss, argnums=(1, 2))(dense, params, x8)
    g1 = jax.grad(loss, argnums=(1, 2))(head, params, x8)
    assert max(jax.tree.leaves(jax.tree.map(_max_err, g0, g1))) < 1e-3

    # non-divisible H falls back to the 1-D column fold — still exact
    xo = x8[:, :21]  # out H 15 (not %4), W 32
    assert _max_err(dense.apply(params, xo), head.apply(params, xo)) < 1e-5


def test_phased_conv_small_batch_falls_back_dense(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 16, 4)), jnp.float32)
    dense = Conv(8, 3, 1, 1, phases=1)
    phased = Conv(8, 3, 1, 1, phases=2)
    params = dense.init(jax.random.PRNGKey(0), x)
    assert _max_err(dense.apply(params, x), phased.apply(params, x)) == 0.0


def test_auto_phases_rule(monkeypatch):
    # disabled by default (in-graph negative result, docs/PERFORMANCE.md)
    assert auto_phases(28) == 1
    monkeypatch.setenv("MDCTGAN_PHASED_CONV", "1")
    assert auto_phases(28) == 4
    assert auto_phases(56) == 2
    assert auto_phases(64) == 2
    assert auto_phases(112) == 1
    assert auto_phases(448) == 1


@pytest.mark.parametrize("block", ["resnet", "convres"])
def test_blocks_phased_equals_reference_math(rng, block, monkeypatch):
    """ConvResBlock with phasing force-enabled at a phase-engaging
    batch/width computes the same values as the dense per-sample path."""
    monkeypatch.setenv("MDCTGAN_PHASED_CONV", "1")
    if block == "resnet":
        mod = ResnetBlock(16)
        x = jnp.asarray(rng.standard_normal((8, 8, 32, 16)), jnp.float32)
    else:
        mod = ConvResBlock(16, 32)
        x = jnp.asarray(rng.standard_normal((8, 8, 32, 16)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    y8 = mod.apply(params, x)
    # batch-1 (dense fallback) per-sample outputs must match the batched
    # (phased) outputs — same math regardless of which path engaged.
    y1 = jnp.concatenate(
        [mod.apply(params, x[i : i + 1]) for i in range(8)], axis=0
    )
    assert _max_err(y8, y1) < 2e-5
