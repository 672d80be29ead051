#!/usr/bin/env python
"""Measure the REFERENCE architecture's full G+D train step in stock torch on
this host's CPU (BASELINE.json: the reference publishes no step time, so this
is the measured anchor for the throughput-per-chip comparison; see
docs/PERFORMANCE.md "Throughput vs the reference" for how it is used).

The model is the stock-torch replica of the reference construction from
tests/test_import_gold.py (key-set- and forward-parity-validated against
/root/reference/models/networks.py).  The step mirrors the reference
schedule (train.py:160-199 + pix2pixHD_model.py:416-452): G forward, D on
(lr, sr.detach()) and (lr, hr), non-detached D pass for G_GAN, LSGAN MSE +
feature-matching L1, two Adam steps.  The MDCT preprocess is excluded
(~9.6 ms/call on the reference's own GPU bench — low single-digit % of a
step; excluding it UNDERSTATES the reference step cost, which is
conservative for our comparison).

Usage: python tools/ref_cpu_step.py [batch] [n_steps]
"""

import importlib.util
import os
import sys
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the gold module imports jax for its flax halves; keep that on CPU so this
# tool never touches the (possibly busy) remote TPU
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

spec = importlib.util.spec_from_file_location(
    "gold", os.path.join(REPO, "tests", "test_import_gold.py")
)
gold = importlib.util.module_from_spec(spec)
sys.modules["gold"] = gold
spec.loader.exec_module(gold)


class MultiscaleD(nn.Module):
    """MultiscaleDiscriminator forward (networks.py:507-550), getIntermFeat."""

    def __init__(self, input_nc, ndf, n_layers, num_D):
        super().__init__()
        self.holder = gold.build_torch_discriminator(input_nc, ndf, n_layers,
                                                     num_D)
        self.num_D, self.n_layers = num_D, n_layers
        self.downsample = nn.AvgPool2d(3, stride=2, padding=[1, 1],
                                       count_include_pad=False)

    def forward(self, x):
        result = []
        for i in range(self.num_D):
            feats = [x]
            for j in range(self.n_layers + 2):
                m = getattr(self.holder, f"scale{self.num_D - 1 - i}_layer{j}")
                feats.append(m(feats[-1]))
            result.append(feats[1:])
            if i != self.num_D - 1:
                x = self.downsample(x)
        return result


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # the environment pins OMP threads to 1 by default — give torch every
    # core so the CPU anchor is as favorable to the reference as possible
    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    G = gold.TorchLocalEnhancer(**gold.FLAGSHIP_LOCAL)  # train.sh config
    D = MultiscaleD(input_nc=3, ndf=64, n_layers=3, num_D=3)
    opt_g = torch.optim.Adam(G.parameters(), lr=1.5e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(D.parameters(), lr=1.5e-4, betas=(0.5, 0.999))
    lr_spec = torch.randn(batch, 2, 128, 256)
    hr_spec = torch.randn(batch, 1, 128, 256)

    def gan_mse(preds, real):
        tgt = 1.0 if real else 0.0
        return sum(F.mse_loss(p[-1], torch.full_like(p[-1], tgt))
                   for p in preds)

    def step():
        sr = G(lr_spec) + lr_spec[:, :1]  # fit_residual
        pred_fake_pool = D(torch.cat((lr_spec, sr.detach()), 1))
        pred_real = D(torch.cat((lr_spec, hr_spec), 1))
        pred_fake = D(torch.cat((lr_spec, sr), 1))
        loss_g = gan_mse(pred_fake, True)
        feat_w = 4.0 / (3 + 1) / 3 * 10.0
        for pf, pr in zip(pred_fake, pred_real):
            for f_, r_ in zip(pf[:-1], pr[:-1]):
                loss_g = loss_g + feat_w * F.l1_loss(f_, r_.detach())
        loss_d = 0.5 * (gan_mse(pred_fake_pool, False) + gan_mse(pred_real, True))
        opt_g.zero_grad(); loss_g.backward(retain_graph=True); opt_g.step()
        opt_d.zero_grad(); loss_d.backward(); opt_d.step()

    step()  # warmup (allocator, thread pools)
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    print(f"torch threads: {torch.get_num_threads()}")
    print(f"reference-arch CPU step, batch {batch}: "
          f"min {min(times):.2f}s mean {sum(times)/len(times):.2f}s "
          f"-> {batch / min(times):.2f} samples/s")


if __name__ == "__main__":
    main()
