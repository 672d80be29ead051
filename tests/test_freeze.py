"""Freeze-mask tests: optax multi_transform masking as the JAX equivalent of
the reference's requires_grad toggles (networks.py:269-298 set_freeze,
pix2pixHD_model.py:331-343 --niter_fix_global)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mdctgan_tpu.configs import tiny_generator
from mdctgan_tpu.models.generator import LocalEnhancer
from mdctgan_tpu.train.freeze import masked_optimizer, param_labels


def _local_enhancer_params():
    gen = LocalEnhancer(
        input_nc=2, output_nc=1, ngf=4, n_downsample_global=2,
        n_blocks_global=1, n_blocks_local=1, n_attn_global=0,
        input_size=(64, 64), downsample_type="conv", upsample_type="transconv",
    )
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2)), train=False)
    return gen, v["params"]


def test_fix_global_freezes_global_only():
    gen, params = _local_enhancer_params()
    labels = param_labels(params, fix_global=True)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    froze = {jax.tree_util.keystr(k): v for k, v in flat}
    assert any(v == "frozen" for v in froze.values())
    for k, v in froze.items():
        if "local" in k:
            assert v == "train", k
        else:
            assert v == "frozen", k


def test_masked_optimizer_keeps_frozen_params():
    gen, params = _local_enhancer_params()
    tx = masked_optimizer(
        optax.adam(1e-2), lambda p: param_labels(p, fix_global=True)
    )
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    for (k, old), (_, fresh) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(new),
    ):
        ks = jax.tree_util.keystr(k)
        if "local" in ks:
            assert not np.allclose(np.asarray(old), np.asarray(fresh)), ks
        else:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(fresh),
                                          err_msg=ks)


def test_freeze_downsample_flags():
    gen = tiny_generator()
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)), train=False)
    labels = param_labels(v["params"], freeze_g_d=True)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(labels)}
    assert any("down" in k and v == "frozen" for k, v in flat.items())
    assert all(v == "train" for k, v in flat.items() if "up" in k)


def test_local_freeze_groups_match_reference_split():
    """The reference freezes the enhancer branch as whole Sequentials — no
    class rule there: --freeze_l_d toggles ALL of model1_1 (ReflectionPad +
    7x7 stem + ONE downsample conv) and --freeze_l_u ALL of model1_2
    (resblocks, attention downsamples, upsamples AND the tanh head)
    (networks.py:286-298).  Pin local_head / local_attn_down* to the UP
    group and local_stem / local_down to the DOWN group."""
    gen = LocalEnhancer(
        input_nc=2, output_nc=1, ngf=4, n_downsample_global=2,
        n_blocks_global=1, n_blocks_local=2, n_attn_global=0, n_attn_local=1,
        heads_l=2, dim_head_l=4, proj_factor_l=2,
        input_size=(64, 64), downsample_type="conv", upsample_type="transconv",
    )
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2)), train=False)
    params = v["params"]
    tops = set(params.keys())
    assert {"local_stem", "local_down", "local_head",
            "local_attn_down0", "local_attn_down_shared"} <= tops

    def top_labels(**kw):
        labels = param_labels(params, **kw)
        return {
            t: set(jax.tree_util.tree_leaves(labels[t])) for t in tops
        }

    down_group = {"local_stem", "local_down"}
    by_d = top_labels(freeze_l_d=True)
    by_u = top_labels(freeze_l_u=True)
    for t in tops:
        if t == "global":
            assert by_d[t] == {"train"} and by_u[t] == {"train"}
        elif t in down_group:
            assert by_d[t] == {"frozen"}, t
            assert by_u[t] == {"train"}, t
        else:  # model1_2: res/attn/up/head
            assert by_d[t] == {"train"}, t
            assert by_u[t] == {"frozen"}, t
