"""Model shape/structure tests (small geometries — single-core CPU CI).

The reference has no tests; these pin the architectural contracts from
networks.py: output shapes, channel progressions, multiscale D feature lists,
and BatchNorm state living only under the attention stack.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdctgan_tpu.models.discriminator import MultiscaleDiscriminator
from mdctgan_tpu.models.generator import GlobalGenerator, LocalEnhancer
from mdctgan_tpu.models.layers import avg_pool_3x3_s2, instance_norm
from mdctgan_tpu.models.losses import feature_matching_loss, gan_loss


def test_instance_norm():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)), jnp.float32)
    y = instance_norm(x)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    v = np.asarray(jnp.var(y, axis=(1, 2)))
    np.testing.assert_allclose(m, 0, atol=1e-5)
    np.testing.assert_allclose(v, 1, atol=1e-3)


@pytest.mark.parametrize("shape,pad", [((2, 8, 9, 3), 3), ((1, 5, 7, 2), 1),
                                       ((3, 16, 12, 4), 2), ((2, 7, 7, 1), 3)])
def test_reflect_pad_matches_jnp_pad(shape, pad):
    # reflect_pad carries a custom VJP (small-slice reverses instead of the
    # activation-sized lax.rev / scatter-add that jnp.pad(reflect) lowers
    # to); value AND gradient must stay exactly ReflectionPad2d semantics.
    from mdctgan_tpu.models.layers import reflect_pad

    def ref(x):
        return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape), jnp.float32)
    got, want = reflect_pad(x, pad), ref(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    ct = jnp.asarray(np.random.default_rng(1).standard_normal(want.shape), jnp.float32)
    g_got = jax.grad(lambda x: jnp.sum(reflect_pad(x, pad) * ct))(x)
    g_want = jax.grad(lambda x: jnp.sum(ref(x) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-5)


@pytest.mark.parametrize("vjp_mode", ["1", "gx"])
@pytest.mark.parametrize("k,p", [(5, 1), (3, 1), (3, 2)])
def test_dilated_up_conv_custom_vjp_matches_autodiff(k, p, vjp_mode, monkeypatch):
    # The dilated upsample-conv ships a hand-written backward (grad_x as a
    # plain stride-2 conv with a kernel-sized flip; grad_k as one dilated
    # conv contracting batch) because XLA's autodiff transpose of an
    # lhs-dilated conv reverses the activation-sized cotangent.  Value AND
    # both gradients must match jax.grad of the raw conv exactly, for BOTH
    # backward forms ('1' all-custom, 'gx' hybrid — the --dilated_vjp A/B).
    from mdctgan_tpu.models.layers import _dilated_up2_conv, _dilated_up2_conv_raw

    monkeypatch.setenv("MDCTGAN_DILATED_VJP", vjp_mode)
    jax.clear_caches()  # the env var is read at trace time inside the bwd

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 3)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((k + 1, k + 1, 3, 4)) * 0.1, jnp.float32)

    def loss(conv, x, kp):
        y = conv(x, kp, p)
        return jnp.sum(jnp.sin(y) * y), y

    (v0, y0), g0 = jax.value_and_grad(
        lambda x, kp: loss(_dilated_up2_conv_raw, x, kp), argnums=(0, 1),
        has_aux=True)(x, kp)
    (v1, y1), g1 = jax.value_and_grad(
        lambda x, kp: loss(_dilated_up2_conv, x, kp), argnums=(0, 1),
        has_aux=True)(x, kp)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]), atol=1e-5)


def test_avg_pool_matches_torch_semantics():
    # count_include_pad=False: edge windows divide by the #valid taps.
    x = jnp.ones((1, 4, 4, 1))
    y = avg_pool_3x3_s2(x)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)
    assert y.shape == (1, 2, 2, 1)


def test_global_generator_shapes():
    g = GlobalGenerator(
        input_nc=2, output_nc=1, ngf=8, n_downsampling=2, n_blocks=2,
        n_attn=1, input_size=(32, 64), heads=2, dim_head=8,
        downsample_type="resconv", upsample_type="interpolate",
    )
    x = jnp.zeros((1, 32, 64, 2))
    vars_ = g.init(jax.random.PRNGKey(0), x, train=False)
    y = g.apply(vars_, x, train=False)
    assert y.shape == (1, 32, 64, 1)
    assert np.asarray(jnp.abs(y)).max() <= 1.0  # tanh head
    # batch_stats exist only because of the attention stack
    assert "batch_stats" in vars_
    flat = flax.traverse_util.flatten_dict(vars_["batch_stats"])
    assert all("attn" in "/".join(k) for k in flat)


def test_global_generator_truncated():
    g = GlobalGenerator(
        input_nc=2, ngf=8, n_downsampling=2, n_blocks=1, n_attn=0,
        input_size=(16, 32), include_head=False,
    )
    x = jnp.zeros((1, 16, 32, 2))
    vars_ = g.init(jax.random.PRNGKey(0), x, train=False)
    y = g.apply(vars_, x, train=False)
    assert y.shape == (1, 16, 32, 8)  # ngf feature channels, no tanh head
    params = flax.traverse_util.flatten_dict(vars_["params"])
    assert not any("head" in k for k2 in params for k in k2)


def test_local_enhancer_shapes():
    g = LocalEnhancer(
        input_nc=2, output_nc=1, ngf=4, n_downsample_global=2,
        n_blocks_global=2, n_blocks_local=2, n_attn_global=1, n_attn_local=0,
        input_size=(32, 64), heads_g=2, dim_head_g=8,
        downsample_type="resconv", upsample_type="interpolate",
    )
    x = jnp.zeros((2, 32, 64, 2))
    vars_ = g.init(jax.random.PRNGKey(0), x, train=False)
    y = g.apply(vars_, x, train=False)
    assert y.shape == (2, 32, 64, 1)


def test_local_enhancer_with_local_attention():
    g = LocalEnhancer(
        input_nc=1, output_nc=1, ngf=4, n_downsample_global=1,
        n_blocks_global=1, n_blocks_local=3, n_attn_global=0, n_attn_local=1,
        input_size=(32, 64), heads_l=2, dim_head_l=8,
    )
    x = jnp.zeros((1, 32, 64, 1))
    vars_ = g.init(jax.random.PRNGKey(0), x, train=False)
    y = g.apply(vars_, x, train=False)
    assert y.shape == (1, 32, 64, 1)
    # shared modules appear once in the tree
    params = flax.traverse_util.flatten_dict(vars_["params"])
    names = {k[0] for k in params}
    assert "local_attn_down_shared" in names and "local_attn_up_shared" in names


def test_multiscale_discriminator():
    d = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=3)
    x = jnp.zeros((2, 64, 128, 3))
    vars_ = d.init(jax.random.PRNGKey(0), x)
    preds = d.apply(vars_, x)
    assert len(preds) == 3
    for feats in preds:
        assert len(feats) == 5  # n_layers + 2 taps
        assert feats[-1].shape[-1] == 1
    # pyramid: each later result is computed on a 2x-smaller input
    # (k4/s2/p2 conv maps H -> H//2 + 1: 64 -> 33, 32 -> 17, 16 -> 9)
    assert [p[0].shape[1] for p in preds] == [33, 17, 9]


def test_losses_scalar_and_grad():
    d = MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
    x = jnp.ones((1, 32, 32, 2))
    vars_ = d.init(jax.random.PRNGKey(0), x)
    fake = d.apply(vars_, x * 0.1)
    real = d.apply(vars_, x)
    g = gan_loss(fake, True)
    f = feature_matching_loss(fake, real, n_layers_d=2, num_d=2)
    assert g.shape == () and f.shape == ()
    assert np.isfinite(float(g)) and np.isfinite(float(f))


@pytest.mark.slow
def test_flagship_config_param_count():
    """train.sh flagship: netG local ngf 56, 3 downsamples, 4 global blocks,
    3 attention blocks (6 heads x 128)."""
    g = LocalEnhancer(
        input_nc=2, output_nc=1, ngf=56, n_downsample_global=3,
        n_blocks_global=4, n_blocks_local=3, n_attn_global=3, n_attn_local=0,
        input_size=(128, 256), heads_g=6, dim_head_g=128, proj_factor_g=4,
        downsample_type="resconv", upsample_type="interpolate",
    )
    x = jnp.zeros((1, 128, 256, 2))
    vars_ = jax.eval_shape(lambda: g.init(jax.random.PRNGKey(0), x, train=False))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(vars_["params"]))
    assert 10_000_000 < n < 120_000_000


def test_bf16_compute_policy():
    """--fp16 equivalent: params stay f32, convs compute in bf16, outputs and
    losses come back f32 and finite."""
    import jax
    import jax.numpy as jnp

    from mdctgan_tpu.configs import tiny_generator

    gen = tiny_generator()
    gen_bf16 = gen.clone(dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 2)), jnp.float32
    )
    v = gen.init(jax.random.PRNGKey(0), x, train=False)
    for leaf in jax.tree.leaves(v["params"]):
        assert leaf.dtype == jnp.float32
    out32 = gen.apply(v, x, train=False)
    out16 = gen_bf16.apply(v, x, train=False)
    assert out16.dtype == jnp.float32  # head casts back up
    assert np.isfinite(np.asarray(out16)).all()
    # same network, reduced precision: outputs close but not identical
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=0.1)


def test_bf16_grads_finite():
    import jax
    import jax.numpy as jnp

    from mdctgan_tpu.configs import tiny_generator

    gen = tiny_generator().clone(dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 32, 2)), jnp.float32
    )
    v = gen.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out = gen.apply({"params": params, **{k: v[k] for k in v if k != "params"}},
                        x, train=False)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
        assert leaf.dtype == jnp.float32


# --------------------------------------------------------------------------
# PolyphaseConv: the MXU-restructured tanh-head conv
# --------------------------------------------------------------------------

def test_polyphase_conv_matches_dense(rng):
    import jax
    import jax.numpy as jnp
    from mdctgan_tpu.models.layers import Conv, PolyphaseConv

    x = jnp.asarray(rng.standard_normal((2, 14, 38, 8)), jnp.float32)  # 32%16=0
    dense = Conv(1, 7)
    poly = PolyphaseConv(1, 7, phases=16)
    params = dense.init(jax.random.PRNGKey(0), x)
    # identical param tree -> dense params drop straight in
    ref = dense.apply(params, x)
    got = poly.apply(params, x)
    assert got.shape == ref.shape == (2, 8, 32, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # gradients through both paths agree
    def loss(fn, p):
        return jnp.sum(jnp.tanh(fn.apply(p, x)) ** 2)

    g1 = jax.grad(lambda p: loss(dense, p))(params)
    g2 = jax.grad(lambda p: loss(poly, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        g1, g2,
    )


def test_polyphase_conv_fallback_non_divisible(rng):
    import jax
    import jax.numpy as jnp
    from mdctgan_tpu.models.layers import Conv, PolyphaseConv

    x = jnp.asarray(rng.standard_normal((1, 10, 21, 4)), jnp.float32)  # 15%16!=0
    dense = Conv(1, 7)
    poly = PolyphaseConv(1, 7, phases=16)
    params = dense.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(poly.apply(params, x)), np.asarray(dense.apply(params, x)),
        atol=1e-5,
    )


def test_polyphase_conv_multifeature(rng):
    import jax
    import jax.numpy as jnp
    from mdctgan_tpu.models.layers import Conv, PolyphaseConv

    x = jnp.asarray(rng.standard_normal((1, 9, 14, 4)), jnp.float32)  # w_out 8
    dense = Conv(3, 7)
    poly = PolyphaseConv(3, 7, phases=4)
    params = dense.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(poly.apply(params, x)), np.asarray(dense.apply(params, x)),
        atol=1e-5,
    )


# --------------------------------------------------------------------------
# UpsampledConv: nearest-2x upsample fused into the conv by polyphase
# --------------------------------------------------------------------------

def _dense_upsample_conv(x, params, k, p):
    import jax.numpy as jnp
    from mdctgan_tpu.models.layers import upsample_nearest_2x

    xu = upsample_nearest_2x(jnp.asarray(x))
    kern = jnp.asarray(params["params"]["conv"]["kernel"])
    bias = jnp.asarray(params["params"]["conv"]["bias"])
    xp = jnp.pad(xu, ((0, 0), (p, p), (p, p), (0, 0)))
    import jax
    y = jax.lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + bias


@pytest.mark.parametrize("k,p", [(5, 1), (3, 1), (3, 2), (7, 3)])
def test_upsampled_conv_matches_dense(rng, k, p):
    import jax
    import jax.numpy as jnp
    from mdctgan_tpu.models.layers import UpsampledConv

    for h, w in ((6, 9), (8, 8)):
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
        mod = UpsampledConv(4, k, p)
        params = mod.init(jax.random.PRNGKey(0), x)
        got = np.asarray(mod.apply(params, x))
        ref = np.asarray(_dense_upsample_conv(x, params, k, p))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_upsampled_conv_grads_match_dense(rng):
    import jax
    import jax.numpy as jnp
    from mdctgan_tpu.models.layers import UpsampledConv

    x = jnp.asarray(rng.standard_normal((1, 6, 7, 3)), jnp.float32)
    mod = UpsampledConv(4, 5, 1)
    params = mod.init(jax.random.PRNGKey(0), x)

    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(mod.apply(p, x))))(params)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(_dense_upsample_conv(x, p, 5, 1))))(
        params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5
        ),
        g1, g2,
    )


def test_upsampled_conv_batch1_matches_dense(rng):
    """Batch-1 (inference) geometry through the default auto->dilated path
    equals the explicit dense oracle."""
    import jax
    import jax.numpy as jnp
    from mdctgan_tpu.models.layers import _UpsampledConvInner

    x = jnp.asarray(rng.standard_normal((1, 6, 7, 3)), jnp.float32)
    auto = _UpsampledConvInner(4, 5, 1)
    dense = _UpsampledConvInner(4, 5, 1, method="dense")
    params = auto.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(dense.apply(params, x)), np.asarray(auto.apply(params, x)),
        atol=1e-5,
    )


def test_upsampled_conv_methods_agree(rng):
    """The three equal-math forms of the fused nearest-2x+conv (dense /
    polyphase / lhs-dilated) must agree bit-tightly for every call-site
    geometry (models/layers.py _UpsampledConvInner)."""
    import jax
    import jax.numpy as jnp

    from mdctgan_tpu.models.layers import _UpsampledConvInner

    for (k, p) in ((5, 1), (3, 1)):
        x = jnp.asarray(rng.standard_normal((2, 6, 10, 8)), jnp.float32)
        outs = {}
        for method in ("dense", "phase", "dilated"):
            m = _UpsampledConvInner(4, k, p, method=method)
            v = m.init(jax.random.PRNGKey(0), x)
            outs[method] = np.asarray(m.apply(v, x))
        np.testing.assert_allclose(outs["phase"], outs["dense"], atol=1e-5)
        np.testing.assert_allclose(outs["dilated"], outs["dense"], atol=1e-5)
