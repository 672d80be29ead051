"""Measure torch's OWN f32 gradient noise floor at flagship geometry.

Runs the reference loss schedule (pix2pixHD_model.py:416-451 semantics, as
transcribed by tests/test_grad_parity.py) on the full flagship G+D
(reference train.sh:3-17 — ngf 56, 3 downsamples, 4 resblocks + 3 attention
blocks of 6 heads x 128, netG local, num_D 3) at the real 128x256 spectro
shape, batch 8, twice: once in float32 and once in float64, in STOCK TORCH
both times.  The per-tensor relative gradient difference between the two is
the framework's own accumulation noise at this geometry — the floor below
which no cross-framework parity bound is meaningful.

Measured on this machine (seed 0, both N(0,0.05) and the reference's
weights_init N(0,0.02) scales):

    init0.05 G: median 3.421e-03  frac>2e-3: 0.96
    init0.05 D: median 8.886e-04  frac>2e-3: 0.37
    init0.02 G: median 3.613e-03  frac>2e-3: 0.94
    init0.02 D: median 1.025e-03  frac>2e-3: 0.37

(The per-tensor max is ~1e9 on tensors whose true gradient is exactly zero
— conv biases feeding train-mode BN — where both dtypes hold pure noise;
the normwise test helper covers those with an absolute floor instead.)

This is why tests/test_flagship_parity.py uses a 1e-2 normwise bound: ~40
stacked f32 conv layers at 128x256 are gradient-chaotic at the 1e-3 level,
so a 2e-3 bound (fine at the reduced 64x64 geometry) would assert below
torch's own noise.  Wiring errors remain detectable — they show up
normwise at O(1)-O(10), two to three orders above 1e-2.

Runtime: ~25 min single-core CPU (the f64 passes dominate).  Usage:

    PYTHONPATH=/root/repo:/root/repo/tests python tools/grad_noise_floor.py
"""
import copy
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from test_e2e_losses import _lsgan, _torch_d_forward  # noqa: E402
from test_import_gold import (  # noqa: E402
    FLAGSHIP_LOCAL,
    _randomize,
    _torch_local,
    build_torch_discriminator,
)

from mdctgan_tpu.ops.features import SpectralConfig, SpectralTransform  # noqa: E402

NUM_D, N_LAYERS, NDF, LAMBDA_FEAT = 3, 3, 64, 10.0
BATCH = 8

t0 = time.time()
rng = np.random.default_rng(0)
cfg = SpectralConfig()
transform = SpectralTransform(cfg)
n0 = cfg.norm_range[0]

hr = 0.1 * rng.standard_normal((BATCH, cfg.segment_length)).astype(np.float32)
lr = hr + 0.01 * rng.standard_normal(hr.shape).astype(np.float32)
lr_spec = np.asarray(transform.lr_forward(jnp.asarray(lr))[0])
hr_spec = np.asarray(transform.hr_forward(jnp.asarray(hr))[0])
print(f"[{time.time()-t0:.0f}s] spectra done", flush=True)


def grads(torch_g, torch_d, dtype):
    """Gradients of the reference G/D losses in the requested dtype."""
    tg = copy.deepcopy(torch_g).to(dtype)
    td = copy.deepcopy(torch_d).to(dtype)
    tg.train()
    td.train()
    tl = torch.from_numpy(lr_spec.copy()).to(dtype)
    th = torch.from_numpy(hr_spec.copy()).to(dtype)
    sr = tg(torch.cat((tl, tl.abs() * 2 + n0), dim=1)) + tl  # fit_residual
    sr_input = torch.cat((sr, sr.abs() * 2 + n0), dim=1)
    hr_input = torch.cat((th, th.abs() * 2 + n0), dim=1)
    fake_concat = torch.cat((tl, sr_input), dim=1).detach()
    loss_d_fake = _lsgan(
        _torch_d_forward(td, fake_concat, NUM_D, N_LAYERS), 0.0)
    pred_real = _torch_d_forward(
        td, torch.cat((tl, hr_input), dim=1), NUM_D, N_LAYERS)
    loss_d_real = _lsgan(pred_real, 1.0)
    pred_fake = _torch_d_forward(
        td, torch.cat((tl, sr_input), dim=1), NUM_D, N_LAYERS)
    loss_g_gan = _lsgan(pred_fake, 1.0)
    feat_w, d_w = 4.0 / (N_LAYERS + 1), 1.0 / NUM_D
    loss_g_feat = torch.zeros((), dtype=dtype)
    for i in range(NUM_D):
        for j in range(len(pred_fake[i]) - 1):
            loss_g_feat = loss_g_feat + d_w * feat_w * LAMBDA_FEAT * torch.mean(
                torch.abs(pred_fake[i][j] - pred_real[i][j].detach()))
    loss_g = loss_g_gan + loss_g_feat
    loss_d = 0.5 * (loss_d_fake + loss_d_real)
    g_g = torch.autograd.grad(loss_g, list(tg.parameters()), retain_graph=True)
    g_d = torch.autograd.grad(loss_d, list(td.parameters()))
    return ([g.detach().double().numpy() for g in g_g],
            [g.detach().double().numpy() for g in g_d])


def run(scale, label):
    r2 = np.random.default_rng(0)
    torch_g = _torch_local(FLAGSHIP_LOCAL)
    torch_d = build_torch_discriminator(
        input_nc=3, ndf=NDF, n_layers=N_LAYERS, num_D=NUM_D)
    if scale == 0.05:
        _randomize(torch_g, r2)
        _randomize(torch_d, r2)
    else:  # the reference's weights_init scale (networks.py:13-19)
        with torch.no_grad():
            for m in (torch_g, torch_d):
                for p in m.parameters():
                    p.copy_(torch.from_numpy(
                        r2.normal(0, scale, p.shape).astype(np.float32)))
                for mod in m.modules():
                    if isinstance(mod, torch.nn.BatchNorm2d):
                        mod.running_mean.zero_()
                        mod.running_var.fill_(1.0)
    g32, d32 = grads(torch_g, torch_d, torch.float32)
    print(f"[{time.time()-t0:.0f}s] {label} f32 grads done", flush=True)
    g64, d64 = grads(torch_g, torch_d, torch.float64)
    print(f"[{time.time()-t0:.0f}s] {label} f64 grads done", flush=True)
    for name, a, b in (("G", g32, g64), ("D", d32, d64)):
        rel = np.array([
            np.linalg.norm(x - y) / (np.linalg.norm(y) + 1e-30)
            for x, y in zip(a, b)])
        print(f"  {label} {name}: rel grad err f32-vs-f64 "
              f"median {np.median(rel):.3e} max {rel.max():.3e} "
              f"frac>2e-3: {(rel > 2e-3).mean():.2f}", flush=True)


if __name__ == "__main__":
    run(0.05, "init0.05")
    run(0.02, "init0.02")
