"""InstanceNorm(+ReLU) op tests: forward vs a float64 torch-style oracle
and the closed-form custom backward vs jax autodiff (ops/norm.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.ops.norm import _jax_instance_norm, instance_norm_fused


def _torch_style_in(x, relu):
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    y = (x - mean) / np.sqrt(var + 1e-5)
    return np.maximum(y, 0) if relu else y


def test_fused_matches_instancenorm2d(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    for relu in (False, True):
        got = np.asarray(instance_norm_fused(x, relu=relu))
        np.testing.assert_allclose(got, _torch_style_in(x, relu), atol=1e-4)


def test_fused_grad_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    for relu in (False, True):
        g1 = jax.grad(lambda v: jnp.sum(jnp.sin(instance_norm_fused(v, relu=relu))))(x)
        g2 = jax.grad(lambda v: jnp.sum(jnp.sin(_jax_instance_norm(v, relu))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_fused_bf16_dtype_preserved(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.bfloat16)
    out = instance_norm_fused(x, relu=True)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_hand_backward_matches_autodiff(rng):
    """The closed-form IN backward (_xla_instance_norm_bwd) vs jax autodiff
    of the same forward formula."""
    from mdctgan_tpu.ops.norm import (
        _jax_instance_norm, _jax_instance_norm_stats, _xla_instance_norm_bwd,
    )

    for relu in (False, True):
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.standard_normal((3, 9, 13, 8)), dtype)
            g = jnp.asarray(rng.standard_normal((3, 9, 13, 8)), dtype)
            _, pullback = jax.vjp(lambda v: _jax_instance_norm(v, relu), x)
            want = np.asarray(pullback(g)[0], np.float32)
            _, mean, inv = _jax_instance_norm_stats(x, relu)
            got = np.asarray(_xla_instance_norm_bwd(x, mean, inv, g, relu),
                             np.float32)
            atol = 1e-5 if dtype == jnp.float32 else 5e-2
            np.testing.assert_allclose(got, want, atol=atol)


def test_custom_vjp_default_path_matches_autodiff(rng):
    """instance_norm_fused's default (non-pallas) custom VJP end-to-end."""
    from mdctgan_tpu.ops.norm import _jax_instance_norm, instance_norm_fused

    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    for relu in (False, True):
        g1 = jax.grad(lambda v: jnp.sum(jnp.sin(instance_norm_fused(v, relu=relu))))(x)
        g2 = jax.grad(lambda v: jnp.sum(jnp.sin(_jax_instance_norm(v, relu))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
