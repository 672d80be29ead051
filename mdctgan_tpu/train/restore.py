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
        import jax.numpy as jnp

        sd = import_torch.load_pth(g_path)
        # Abstract init template (shapes only, no device compile) enables the
        # reference's fuzzy fallback ladder (base_model.py:61-111): shape
        # checks + intersection load + --param_key_map renames.  Only if the
        # ladder must KEEP init values for unmatched modules do we pay a real
        # Module.init.
        key = jax.random.PRNGKey(0)
        x_spec = jax.ShapeDtypeStruct(
            (1, cfg.n_bins, cfg.n_fft // 2, opt.input_nc), jnp.float32
        )
        abstract = jax.eval_shape(
            lambda k, x: generator.init(k, x, train=False), key, x_spec
        )
        key_map = getattr(opt, "param_key_map", None) or None
        try:
            params, stats = import_torch.import_generator(
                sd, generator, param_key_map=key_map, init_vars=abstract
            )
        except import_torch.InitValuesNeeded:
            tmpl = generator.init(key, jnp.zeros(x_spec.shape), train=False)
            params, stats = import_torch.import_generator(
                sd, generator, param_key_map=key_map, init_vars=tmpl
            )
        print(f"imported pretrained G from {g_path}")
        return {"params": params, "batch_stats": stats}

    # orbax checkpoint directory produced by our train.py.  Restore ONLY the
    # generator weights: a full-state template would have to reproduce the
    # optax optimizer-state structure of the training run (which varies with
    # --freeze_*/--niter_fix_global masking) — a partial restore is
    # structure-agnostic.
    import jax.numpy as jnp

    # Shapes-only template: orbax PyTreeRestore accepts abstract leaves, and
    # a real Module.init here would pay a device compile per invocation
    # (minutes for the flagship through the remote tunnel) just to be a
    # shape/dtype donor.
    tmpl_vars = jax.eval_shape(
        lambda k, x: generator.init(k, x, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct(
            (1, cfg.n_bins, cfg.n_fft // 2, opt.input_nc), jnp.float32
        ),
    )
    mgr = ckpt_mod.CheckpointManager(os.path.join(opt.load_pretrain, "ckpt"))
    # --which_epoch N selects the end-of-epoch-N checkpoint via the
    # epoch->step index (reference <epoch>_net_G.pth, base_model.py:50-53)
    step = mgr.resolve_epoch(getattr(opt, "which_epoch", "latest"))
    sub = mgr.restore_fields(
        {
            "g_params": tmpl_vars["params"],
            "batch_stats": tmpl_vars.get("batch_stats", {}),
        },
        step=step,
    )
    mgr.close()
    print(f"restored orbax checkpoint from {opt.load_pretrain} (step {step})")
    return {"params": sub["g_params"], "batch_stats": sub["batch_stats"]}
