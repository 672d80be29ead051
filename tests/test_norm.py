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


# ---------------------------------------------------------------------------
# Train-mode BatchNorm2d closed-form VJP (ops/norm.py batch_norm2d_train)
# ---------------------------------------------------------------------------


def _bn_autodiff(x, scale, bias, mask=None):
    """The plain two-pass BN formula _BN2D falls back to (MDCTGAN_BN_VJP=0) —
    the autodiff reference the custom VJP must match."""
    if mask is None:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x - mean), axis=(0, 1, 2))
    else:
        m = mask.reshape(-1, 1, 1, 1)
        n = jnp.sum(m) * (x.shape[1] * x.shape[2])
        mean = jnp.sum(x * m, axis=(0, 1, 2)) / n
        var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1, 2)) / n
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return y, mean, var


def test_bn_train_fused_matches_autodiff(rng):
    from mdctgan_tpu.ops.norm import batch_norm2d_train

    x = jnp.asarray(rng.standard_normal((4, 8, 16, 8)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(8), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(8), jnp.float32)
    for mask in (None, jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)):
        got = batch_norm2d_train(x, scale, bias, mask)
        want = _bn_autodiff(x, scale, bias, mask)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-6, rtol=1e-5)

        def loss(fn):
            def inner(xv, sv, bv):
                y, _, _ = fn(xv, sv, bv, mask)
                # cos() makes the cotangent a non-trivial function of y
                return jnp.sum(jnp.cos(y) * y)
            return inner

        g1 = jax.grad(loss(batch_norm2d_train), argnums=(0, 1, 2))(
            x, scale, bias)
        g2 = jax.grad(loss(_bn_autodiff), argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)


def test_bn_train_fused_stat_output_grads(rng):
    """Gradients THROUGH the mean/var outputs (zero in the real train step,
    but the VJP claims correctness for them) vs autodiff."""
    from mdctgan_tpu.ops.norm import batch_norm2d_train

    x = jnp.asarray(rng.standard_normal((4, 6, 10, 5)), jnp.float32)
    scale = jnp.ones(5, jnp.float32)
    bias = jnp.zeros(5, jnp.float32)
    for mask in (None, jnp.asarray([1.0, 0.0, 1.0, 1.0], jnp.float32)):
        def loss(fn):
            def inner(xv):
                y, mean, var = fn(xv, scale, bias, mask)
                return jnp.sum(y) + jnp.sum(jnp.sin(mean)) + 2.0 * jnp.sum(var)
            return inner

        g1 = jax.grad(loss(batch_norm2d_train))(x)
        g2 = jax.grad(loss(_bn_autodiff))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-5, rtol=1e-4)


def test_bn2d_module_env_paths_agree(rng):
    """_BN2D produces the same values/grads with MDCTGAN_BN_VJP on and off
    (train mode, masked and unmasked), and identical running-stat updates."""
    import os

    from mdctgan_tpu.models.attention import BatchNorm

    x = jnp.asarray(rng.standard_normal((4, 4, 6, 3)), jnp.float32)
    mod = BatchNorm(use_running_average=False)
    variables = mod.init(jax.random.PRNGKey(0), x)

    def run(mask):
        def f(params):
            y, mut = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, mask, mutable=["batch_stats"])
            return jnp.sum(jnp.tanh(y)), (y, mut)
        (l, (y, mut)), g = jax.value_and_grad(f, has_aux=True)(
            variables["params"])
        return l, y, mut, g

    prev = os.environ.get("MDCTGAN_BN_VJP")
    try:
        for mask in (None, jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)):
            os.environ["MDCTGAN_BN_VJP"] = "1"
            l1, y1, mut1, g1 = run(mask)
            os.environ["MDCTGAN_BN_VJP"] = "0"
            l0, y0, mut0, g0 = run(mask)
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                       atol=2e-6, rtol=1e-5)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4),
                (mut1, g1), (mut0, g0))
    finally:
        if prev is None:
            os.environ.pop("MDCTGAN_BN_VJP", None)
        else:
            os.environ["MDCTGAN_BN_VJP"] = prev
