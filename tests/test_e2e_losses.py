"""Loss-wiring parity vs a stock-torch oracle.

Replays the reference's loss assembly (pix2pixHD_model.py:416-451 +
train.py:170-178) with the stock-torch generator/discriminator skeletons
from test_import_gold.py — including the multiscale forward's REVERSED scale
order (full-resolution input through scale{num_D-1}, networks.py:537-550) —
and asserts the fused train step reports the same G_GAN / G_GAN_Feat /
D_real / D_fake on identical weights and inputs.

The per-module math is unit-tested elsewhere (test_import_gold forward
parity, test_models losses); this pins the *wiring*: D input concat order,
abs-channel formula, scale ordering, feature-matching weights, and the 0.5
D-loss factor.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn as nn

from test_e2e_inference import GEN_CFG, _spectral_cfg
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

NUM_D, N_LAYERS, NDF, LAMBDA_FEAT = 3, 3, 8, 10.0


def _torch_d_forward(holder, x, num_d, n_layers):
    """Reference MultiscaleDiscriminator.forward (networks.py:537-550):
    scale{num_D-1} sees the full-resolution input, then avg-pool downsample."""
    down = nn.AvgPool2d(3, stride=2, padding=[1, 1], count_include_pad=False)
    result = []
    for i in range(num_d):
        feats = [x]
        for j in range(n_layers + 2):
            feats.append(
                getattr(holder, f"scale{num_d - 1 - i}_layer{j}")(feats[-1]))
        result.append(feats[1:])
        if i != num_d - 1:
            x = down(x)
    return result


def _lsgan(preds, target):
    return sum(torch.mean((scale[-1] - target) ** 2) for scale in preds)


def test_train_step_loss_parity_vs_torch_oracle(rng):
    cfg = _spectral_cfg()
    transform = SpectralTransform(cfg)

    # --- shared weights: randomize torch, import into flax -------------- #
    torch_g = _torch_local(GEN_CFG)
    _randomize(torch_g, rng)
    torch_g.train()
    flax_g = _flax_local(GEN_CFG)
    g_params, g_stats = import_torch.import_generator(
        torch_g.state_dict(), flax_g)

    torch_d = build_torch_discriminator(
        input_nc=3, ndf=NDF, n_layers=N_LAYERS, num_D=NUM_D)
    _randomize(torch_d, rng)
    torch_d.train()
    d_params = import_torch.import_discriminator(
        torch_d.state_dict(), NUM_D, N_LAYERS)
    flax_d = MultiscaleDiscriminator(ndf=NDF, n_layers=N_LAYERS, num_D=NUM_D)

    # --- identical inputs ------------------------------------------------ #
    b, t = 2, cfg.segment_length
    hr = 0.1 * rng.standard_normal((b, t)).astype(np.float32)
    lr = hr + 0.01 * rng.standard_normal((b, t)).astype(np.float32)
    lr_spec = np.asarray(transform.lr_forward(jnp.asarray(lr))[0])
    hr_spec = np.asarray(transform.hr_forward(jnp.asarray(hr))[0])

    # --- torch oracle (pix2pixHD_model.py:416-451) ----------------------- #
    n0 = cfg.norm_range[0]
    tl, th = torch.from_numpy(lr_spec), torch.from_numpy(hr_spec)
    with torch.no_grad():
        sr = torch_g(torch.cat((tl, tl.abs() * 2 + n0), dim=1))
        sr = sr + tl  # fit_residual
        sr_input = torch.cat((sr, sr.abs() * 2 + n0), dim=1)
        hr_input = torch.cat((th, th.abs() * 2 + n0), dim=1)
        pred_fake = _torch_d_forward(
            torch_d, torch.cat((tl, sr_input), dim=1), NUM_D, N_LAYERS)
        pred_real = _torch_d_forward(
            torch_d, torch.cat((tl, hr_input), dim=1), NUM_D, N_LAYERS)
        ref = {
            "G_GAN": float(_lsgan(pred_fake, 1.0)),
            "D_fake": float(_lsgan(pred_fake, 0.0)),
            "D_real": float(_lsgan(pred_real, 1.0)),
        }
        feat_w, d_w, gfeat = 4.0 / (N_LAYERS + 1), 1.0 / NUM_D, 0.0
        for i in range(NUM_D):
            for j in range(len(pred_fake[i]) - 1):
                gfeat += d_w * feat_w * LAMBDA_FEAT * float(
                    torch.mean(torch.abs(pred_fake[i][j] - pred_real[i][j])))
        ref["G_GAN_Feat"] = gfeat

    # --- our fused step on the imported weights -------------------------- #
    g_tx, d_tx = optax.adam(2e-4, b1=0.5), optax.adam(2e-4, b1=0.5)
    h, w = GEN_CFG["input_size"]
    state = create_train_state(
        jax.random.PRNGKey(0), flax_g, flax_d, g_tx, d_tx,
        spectro_shape=(h, w), g_in_channels=2, d_in_channels=3,
    )
    state = state.replace(
        g_params=g_params, batch_stats=g_stats, d_params=d_params)
    step = build_train_step(
        flax_g, flax_d, transform, g_tx, d_tx, num_d=NUM_D,
        n_layers_d=N_LAYERS, lambda_feat=LAMBDA_FEAT, donate=False,
    )
    _, metrics = step(
        state,
        {"lr_audio": jnp.asarray(lr), "hr_audio": jnp.asarray(hr)},
        jax.random.PRNGKey(1),
    )

    for k, v in ref.items():
        np.testing.assert_allclose(
            float(metrics[k]), v, rtol=5e-3, atol=1e-5, err_msg=k)
    # train.py:174-178 composition
    np.testing.assert_allclose(
        float(metrics["loss_D"]),
        0.5 * (ref["D_fake"] + ref["D_real"]), rtol=5e-3)
    np.testing.assert_allclose(
        float(metrics["loss_G"]),
        ref["G_GAN"] + ref["G_GAN_Feat"], rtol=5e-3)
