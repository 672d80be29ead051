"""Gradient and optimizer-trajectory parity vs the reference schedule.

test_e2e_losses.py pins loss VALUES against a stock-torch replay — but loss
values cannot detect wrong ``stop_gradient`` placement (train/step.py: lr/hr
spec detach, D-params-sg for G_GAN, fake detach for D_fake), wrong pool-mix
gradient routing, or optimizer wiring.  This file closes that hole:

  * gradient parity — both sides take ONE plain-SGD step (lr=1), so the
    parameter delta IS the gradient; the torch side replays the reference's
    exact two-backward schedule (train.py:182-199: optimizer_G.zero_grad →
    loss_G.backward → step, then optimizer_D.zero_grad → loss_D.backward →
    step, with detach semantics from pix2pixHD_model.py:369,429-441) and the
    recovered G/D gradient trees must match the fused step's, norm-wise per
    tensor.  Run with the pool off AND with a deterministic pool mix.
  * Adam trajectory parity — 3 full reference-schedule steps with two
    torch.optim.Adam(lr=2e-4, betas=(0.5, 0.999)) vs 3 fused steps with two
    optax.adam; params must track after every update.

Together with the loss-value test this certifies the fused single-backward
step reproduces the reference's two-backward two-Adam dynamics exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

from test_e2e_inference import GEN_CFG, _spectral_cfg
from test_e2e_losses import NDF, NUM_D, N_LAYERS, LAMBDA_FEAT, _lsgan, _torch_d_forward
from test_import_gold import (
    _flax_local,
    _randomize,
    _torch_local,
    build_torch_discriminator,
)

from mdctgan_tpu.models.discriminator import MultiscaleDiscriminator
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.train import import_torch
from mdctgan_tpu.train.state import create_train_state
from mdctgan_tpu.train.step import build_train_step


def _setup(rng):
    """Shared twins: randomized torch G/D, flax twins on imported weights,
    identical audio batch, and the spectro constants the torch replay needs."""
    cfg = _spectral_cfg()
    transform = SpectralTransform(cfg)

    torch_g = _torch_local(GEN_CFG)
    _randomize(torch_g, rng)
    torch_g.train()
    flax_g = _flax_local(GEN_CFG)
    g_params, g_stats = import_torch.import_generator(torch_g.state_dict(), flax_g)

    torch_d = build_torch_discriminator(
        input_nc=3, ndf=NDF, n_layers=N_LAYERS, num_D=NUM_D)
    _randomize(torch_d, rng)
    torch_d.train()
    d_params = import_torch.import_discriminator(torch_d.state_dict(), NUM_D, N_LAYERS)
    flax_d = MultiscaleDiscriminator(ndf=NDF, n_layers=N_LAYERS, num_D=NUM_D)

    b, t = 2, cfg.segment_length
    hr = 0.1 * rng.standard_normal((b, t)).astype(np.float32)
    lr = hr + 0.01 * rng.standard_normal((b, t)).astype(np.float32)
    lr_spec = np.asarray(transform.lr_forward(jnp.asarray(lr))[0])
    hr_spec = np.asarray(transform.hr_forward(jnp.asarray(hr))[0])

    return dict(
        cfg=cfg, transform=transform,
        torch_g=torch_g, torch_d=torch_d,
        flax_g=flax_g, flax_d=flax_d,
        g_params=g_params, g_stats=g_stats, d_params=d_params,
        lr=lr, hr=hr, lr_spec=lr_spec, hr_spec=hr_spec,
    )


def _torch_reference_step(env, opt_g, opt_d, pool_old=None, pool_mask=None):
    """One full reference iteration: shared forward, loss assembly
    (pix2pixHD_model.py:416-451, train.py:174-178), then the two-backward
    two-step schedule (train.py:182-199)."""
    n0 = env["cfg"].norm_range[0]
    tl = torch.from_numpy(env["lr_spec"])
    th = torch.from_numpy(env["hr_spec"])
    torch_g, torch_d = env["torch_g"], env["torch_d"]

    sr = torch_g(torch.cat((tl, tl.abs() * 2 + n0), dim=1)) + tl  # fit_residual
    sr_input = torch.cat((sr, sr.abs() * 2 + n0), dim=1)
    hr_input = torch.cat((th, th.abs() * 2 + n0), dim=1)

    # D_fake: whole test image detached (discriminate_F, pix2pixHD_model.py:369)
    fake_concat = torch.cat((tl, sr_input), dim=1).detach()
    if pool_old is not None:
        m = torch.from_numpy(pool_mask.astype(np.float32)).view(-1, 1, 1, 1)
        d_fake_in = m * torch.from_numpy(pool_old) + (1.0 - m) * fake_concat
    else:
        d_fake_in = fake_concat
    pred_fake_pool = _torch_d_forward(torch_d, d_fake_in, NUM_D, N_LAYERS)
    loss_d_fake = _lsgan(pred_fake_pool, 0.0)

    pred_real = _torch_d_forward(
        torch_d, torch.cat((tl, hr_input), dim=1), NUM_D, N_LAYERS)
    loss_d_real = _lsgan(pred_real, 1.0)

    # G_GAN: live (non-detached) pair (pix2pixHD_model.py:439-441)
    pred_fake = _torch_d_forward(
        torch_d, torch.cat((tl, sr_input), dim=1), NUM_D, N_LAYERS)
    loss_g_gan = _lsgan(pred_fake, 1.0)
    feat_w, d_w = 4.0 / (N_LAYERS + 1), 1.0 / NUM_D
    loss_g_feat = torch.zeros(())
    for i in range(NUM_D):
        for j in range(len(pred_fake[i]) - 1):
            loss_g_feat = loss_g_feat + d_w * feat_w * LAMBDA_FEAT * torch.mean(
                torch.abs(pred_fake[i][j] - pred_real[i][j].detach()))

    loss_g = loss_g_gan + loss_g_feat
    loss_d = 0.5 * (loss_d_fake + loss_d_real)

    opt_g.zero_grad()
    loss_g.backward()
    opt_g.step()
    opt_d.zero_grad()
    loss_d.backward()
    opt_d.step()
    # train-mode SR spectro, for forward-parity checks at the same geometry
    # (test_flagship_parity.py); pre-step weights since backward ran after.
    return sr.detach().numpy()


def _fused_state_and_step(env, g_tx, d_tx, use_pool=False):
    h, w = GEN_CFG["input_size"]
    state = create_train_state(
        jax.random.PRNGKey(0), env["flax_g"], env["flax_d"], g_tx, d_tx,
        spectro_shape=(h, w), g_in_channels=2, d_in_channels=3,
    )
    state = state.replace(
        g_params=env["g_params"], batch_stats=env["g_stats"],
        d_params=env["d_params"])
    step = build_train_step(
        env["flax_g"], env["flax_d"], env["transform"], g_tx, d_tx,
        num_d=NUM_D, n_layers_d=N_LAYERS, lambda_feat=LAMBDA_FEAT,
        donate=False, use_pool=use_pool,
    )
    batch = {"lr_audio": jnp.asarray(env["lr"]), "hr_audio": jnp.asarray(env["hr"])}
    return state, step, batch


def _import_torch_params(env):
    g_params, g_stats = import_torch.import_generator(
        env["torch_g"].state_dict(), env["flax_g"])
    d_params = import_torch.import_discriminator(
        env["torch_d"].state_dict(), NUM_D, N_LAYERS)
    return g_params, g_stats, d_params


def _leaves(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [("/".join(str(k) for k in path), np.asarray(v)) for path, v in flat]


def _assert_tree_close_normwise(ref_tree, got_tree, rel, label,
                                floor=5e-5):
    """Per-tensor: ||got - ref||_2 <= rel * ||ref||_2 + floor.

    The absolute floor covers tensors whose true gradient is EXACTLY zero
    mathematically (a conv bias immediately followed by a train-mode mean-
    subtracting norm — instance or batch — kills any constant shift), so
    both frameworks hold only f32 accumulation noise there.  The dust
    scales with the reduction size: ~1e-5 at this file's reduced geometry
    (default floor), ~2e-4 measured at flagship 128x256/batch-8 (the
    flagship test passes a bigger floor).  Wiring errors (leaked/zeroed/
    detach-misplaced grads) are O(1)–O(10) here, 4-5 orders above either.
    """
    ref_l, got_l = _leaves(ref_tree), _leaves(got_tree)
    assert [k for k, _ in ref_l] == [k for k, _ in got_l]
    for (name, r), (_, g) in zip(ref_l, got_l):
        err = float(np.linalg.norm((g - r).ravel()))
        bound = rel * float(np.linalg.norm(r.ravel())) + floor
        assert err <= bound, (
            f"{label} {name}: ||diff||={err:.3e} > {bound:.3e} "
            f"(||ref||={np.linalg.norm(r.ravel()):.3e})")


def _pool_inputs(env, rng):
    """Deterministic pool mix: sample 0 replayed from the buffer, sample 1
    uses the current fake (per-sample swap, util/image_pool.py:11-30)."""
    b = env["lr_spec"].shape[0]
    h, w = GEN_CFG["input_size"]
    pool_old = rng.normal(0, 0.3, (b, 3, h, w)).astype(np.float32)
    pool_mask = np.array([1.0, 0.0][:b], np.float32)
    return pool_old, pool_mask


def _grad_parity(rng, use_pool):
    env = _setup(rng)
    pool_old = pool_mask = None
    if use_pool:
        pool_old, pool_mask = _pool_inputs(env, rng)

    # SGD(lr=1): p1 = p0 - g, so the update delta IS the gradient.
    g0, s0, d0 = _import_torch_params(env)
    opt_g = torch.optim.SGD(env["torch_g"].parameters(), lr=1.0)
    opt_d = torch.optim.SGD(env["torch_d"].parameters(), lr=1.0)
    _torch_reference_step(env, opt_g, opt_d, pool_old, pool_mask)
    g1, _, d1 = _import_torch_params(env)

    sgd = optax.sgd(1.0)
    state, step, batch = _fused_state_and_step(env, sgd, sgd, use_pool=use_pool)
    if use_pool:
        new_state, _ = step(state, batch, jax.random.PRNGKey(1),
                            jnp.asarray(pool_old), jnp.asarray(pool_mask))
    else:
        new_state, _ = step(state, batch, jax.random.PRNGKey(1))

    sub = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), g0, g1)
    sub_j = jax.tree.map(
        lambda a, b: np.asarray(a) - np.asarray(b), state.g_params, new_state.g_params)
    _assert_tree_close_normwise(sub, sub_j, 2e-3, "G grad")
    sub_d = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), d0, d1)
    sub_dj = jax.tree.map(
        lambda a, b: np.asarray(a) - np.asarray(b), state.d_params, new_state.d_params)
    _assert_tree_close_normwise(sub_d, sub_dj, 2e-3, "D grad")


def test_gradient_parity_vs_reference_schedule(rng):
    _grad_parity(rng, use_pool=False)


def test_gradient_parity_with_pool_mix(rng):
    _grad_parity(rng, use_pool=True)


def test_adam_trajectory_parity(rng):
    """3 reference-schedule torch steps (two Adams) vs 3 fused steps: params
    must track after every update.

    Tolerance note: at Adam's first steps the update is ~lr*sign(m/sqrt(v)).
    A tensor whose TRUE gradient is mathematically zero (conv bias feeding
    train-mode BN) holds only f32 noise, so EVERY element's update sign is
    framework-dependent — divergence ~lr there is inherent, not a wiring
    error.  Those leaves are identified by a gradient probe (one SGD(lr=1)
    reference step on deep copies; the delta IS the gradient) and exempted
    from the tight RMS bound; they still must satisfy the |update|-budget
    bound.  Wiring errors shift whole live tensors by O(lr), far above the
    RMS bound kept for every live leaf.
    """
    import copy

    lr, b1 = 2e-4, 0.5
    env = _setup(rng)

    # --- gradient probe: which leaves are at the noise floor? ---------- #
    probe = dict(env, torch_g=copy.deepcopy(env["torch_g"]),
                 torch_d=copy.deepcopy(env["torch_d"]))
    pg0, _, pd0 = _import_torch_params(probe)
    _torch_reference_step(
        probe,
        torch.optim.SGD(probe["torch_g"].parameters(), lr=1.0),
        torch.optim.SGD(probe["torch_d"].parameters(), lr=1.0))
    pg1, _, pd1 = _import_torch_params(probe)
    noise_floor = {}
    for t0, t1 in ((pg0, pg1), (pd0, pd1)):
        for (name, a), (_, b) in zip(_leaves(t0), _leaves(t1)):
            grad_rms = float(np.sqrt(np.mean((a - b) ** 2)))
            noise_floor[name] = grad_rms < 1e-5
    opt_g = torch.optim.Adam(env["torch_g"].parameters(), lr=lr, betas=(b1, 0.999))
    opt_d = torch.optim.Adam(env["torch_d"].parameters(), lr=lr, betas=(b1, 0.999))
    tx_g, tx_d = optax.adam(lr, b1=b1), optax.adam(lr, b1=b1)
    state, step, batch = _fused_state_and_step(env, tx_g, tx_d)

    for k in range(3):
        _torch_reference_step(env, opt_g, opt_d)
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        g_ref, _, d_ref = _import_torch_params(env)
        # per-tensor RMS of the divergence must stay well under one Adam
        # update (lr); isolated sign flips are diluted by the RMS.
        for label, ref_tree, got_tree in (
            ("G", g_ref, state.g_params), ("D", d_ref, state.d_params)):
            for (name, r), (_, g) in zip(_leaves(ref_tree), _leaves(got_tree)):
                rms = float(np.sqrt(np.mean((g - r) ** 2)))
                if not noise_floor[name]:
                    assert rms <= 0.05 * lr, (
                        f"step {k+1} {label} {name}: RMS divergence "
                        f"{rms:.3e} > {0.05 * lr:.3e}")
                mx = float(np.max(np.abs(g - r)))
                assert mx <= 2.5 * lr * (k + 1), (
                    f"step {k+1} {label} {name}: max divergence {mx:.3e}")
