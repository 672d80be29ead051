#!/usr/bin/env python
"""Export a trained orbax checkpoint as reference-format ``.pth`` files.

The reference consumes per-net torch ``state_dict``s named
``<epoch>_net_G.pth`` / ``<epoch>_net_D.pth`` with ``nn.Sequential``
index keys (base_model.py:43-53).  This CLI is the inverse of the importer
(train/import_torch.py): it converts a checkpoint trained HERE back into
files the PyTorch reference loads verbatim — so users can move models in
both directions (TPU training -> GPU/torch inference, or A/B the two stacks
on identical weights).

Usage:
    python -m mdctgan_tpu.export_torch_cli --load_pretrain <dir> \
        --export_dir <out> [--which_epoch latest] ...model flags...
"""

from __future__ import annotations

import os

import jax
import numpy as np

from mdctgan_tpu.train.import_torch import (
    discriminator_entries,
    export_to_torch_keys,
    generator_entries_for,
)


def export_state_to_pth(state, generator, opt, out_dir: str,
                        label: str = "latest") -> list:
    """Write <label>_net_G.pth (+ _net_D.pth when D params exist).
    Returns the written paths."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    written = []

    def save(torch_keys: dict, name: str) -> None:
        sd = {
            k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
            for k, v in torch_keys.items()
        }
        path = os.path.join(out_dir, name)
        torch.save(sd, path)
        written.append(path)

    g_entries = generator_entries_for(generator)
    save(
        export_to_torch_keys(state.g_params, state.batch_stats, g_entries),
        f"{label}_net_G.pth",
    )
    if state.d_params:
        d_entries = discriminator_entries(opt.num_D, opt.n_layers_D)
        save(
            export_to_torch_keys(state.d_params, {}, d_entries),
            f"{label}_net_D.pth",
        )
    return written


def main() -> None:
    from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env

    honor_jax_platforms_env()

    from types import SimpleNamespace

    import jax.numpy as jnp

    from mdctgan_tpu.models.discriminator import build_discriminator
    from mdctgan_tpu.models.generator import build_generator
    from mdctgan_tpu.options import TrainOptions, spectral_config_from_opt
    from mdctgan_tpu.train.checkpoint import CheckpointManager

    parser = TrainOptions()
    parser.initialize()
    parser.parser.add_argument(
        "--export_dir", type=str, required=True,
        help="directory to write <label>_net_{G,D}.pth into",
    )
    parser.parser.add_argument(
        "--export_step", type=int, default=None,
        help="orbax step to export (default: resolve --which_epoch through "
             "the epoch index; 'latest' = newest save)",
    )
    opt = parser.parse(save=False)
    if not opt.load_pretrain:
        raise SystemExit("--load_pretrain (orbax checkpoint dir) is required")

    cfg = spectral_config_from_opt(opt)
    generator = build_generator(opt)
    discriminator = build_discriminator(opt)
    # Weights-only partial restore: a full-state template would have to
    # reproduce the training run's optax optimizer-state structure (which
    # varies with --freeze_*/--niter_fix_global masking).
    g_tmpl = generator.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_bins, cfg.n_fft // 2, opt.input_nc)),
        train=False,
    )
    d_tmpl = discriminator.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_bins, cfg.n_fft // 2,
                   opt.input_nc + opt.output_nc)),
    )
    mgr = CheckpointManager(os.path.join(opt.load_pretrain, "ckpt"))
    # --export_step wins; otherwise --which_epoch N resolves through the
    # epoch->step index (reference <epoch>_net_G.pth, base_model.py:50-53)
    step = (opt.export_step if opt.export_step is not None
            else mgr.resolve_epoch(opt.which_epoch))
    sub = mgr.restore_fields(
        {
            "g_params": g_tmpl["params"],
            "batch_stats": g_tmpl.get("batch_stats", {}),
            "d_params": d_tmpl["params"],
        },
        step=step,
    )
    mgr.close()
    print(f"restored step {step}")
    state = SimpleNamespace(
        g_params=sub["g_params"],
        batch_stats=sub["batch_stats"],
        d_params=sub["d_params"],
    )
    for path in export_state_to_pth(state, generator, opt, opt.export_dir,
                                    opt.which_epoch):
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
