"""Generator-weights restoration shared by inference entry points.

The reference loads weights through ``BaseModel.load_network``
(base_model.py:49-111) from ``<dir>/<epoch>_net_G.pth``; here the same
``--load_pretrain`` directory may hold either such a ``.pth`` (imported via
train/import_torch.py) or an orbax ``ckpt/`` produced by our train.py.
"""

from __future__ import annotations

import os
from typing import Dict

import jax


def load_generator_vars(opt, generator, cfg) -> Dict:
    """Resolve ``--load_pretrain`` into ``{"params", "batch_stats"}`` for the
    generator.  Raises SystemExit when no weights are available."""
    from mdctgan_tpu.train import checkpoint as ckpt_mod
    from mdctgan_tpu.train import import_torch

    if not opt.load_pretrain:
        raise SystemExit("--load_pretrain is required (no weights to run)")
    g_path = os.path.join(opt.load_pretrain, f"{opt.which_epoch}_net_G.pth")
    if os.path.exists(g_path):
        sd = import_torch.load_pth(g_path)
        params, stats = import_torch.import_generator(sd, generator)
        print(f"imported pretrained G from {g_path}")
        return {"params": params, "batch_stats": stats}

    # orbax checkpoint directory produced by our train.py; the template must
    # match the saved opt-state STRUCTURE, so build the optimizers the same
    # way train.py does (steps_per_epoch only affects schedule values).
    from mdctgan_tpu.models.discriminator import build_discriminator
    from mdctgan_tpu.train.schedule import make_optimizers
    from mdctgan_tpu.train.state import create_train_state

    g_tx, d_tx = make_optimizers(opt.lr, opt.beta1, opt.niter, opt.niter_decay, 1)
    tmpl = create_train_state(
        jax.random.PRNGKey(0), generator, build_discriminator(opt),
        g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=opt.input_nc,
        d_in_channels=opt.input_nc + opt.output_nc,
    )
    mgr = ckpt_mod.CheckpointManager(os.path.join(opt.load_pretrain, "ckpt"))
    state, _, _ = mgr.restore(tmpl)
    print(f"restored orbax checkpoint from {opt.load_pretrain}")
    return {"params": state.g_params, "batch_stats": state.batch_stats}
