#!/usr/bin/env python
"""One-shot import verifier for reference-format ``.pth`` checkpoints.

Point it at any ``*_net_G.pth`` / ``*_net_D.pth`` (e.g. the published
HuggingFace files the reference README links, /root/reference/README.md:27)
plus the model flags that describe the architecture it was trained with, and
it reports — without touching any training state — exactly what the importer
(train/import_torch.py) would do with it:

  * matched / missing / leftover torch keys (the reference's fuzzy-load
    ladder, base_model.py:61-111),
  * ``--param_key_map`` renames actually applied,
  * per-key shape diffs (expected torch layout vs what the file carries),
  * with ``--forward``: a real import followed by one deterministic forward
    pass, printing output stats + a checksum — proof the imported tree runs
    (and a fingerprint to compare against the same checkpoint exported back
    via export_torch_cli, or across machines).

Exit status: 0 iff every required key matched with the right shape (i.e. the
strict, no-fallback load succeeds); 1 otherwise.

Usage:
    python tools/verify_import.py <ckpt.pth> [--forward] [model flags...]

    # e.g. the flagship published checkpoint:
    python tools/verify_import.py 60_net_G.pth --forward \
        --netG local --ngf 56 --n_downsample_global 3 --n_blocks_global 4 \
        --n_blocks_attn_g 3 --dim_head_g 128 --heads_g 6 --proj_factor_g 4 \
        --n_blocks_attn_l 0 --n_blocks_local 3 \
        --upsample_type interpolate --downsample_type resconv --fit_residual
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _expected_shapes(entries, module, in_shape):
    """Torch-layout expected shape per torch key, via an ABSTRACT init
    (jax.eval_shape — no FLOPs, no memory)."""
    from mdctgan_tpu.train import import_torch

    def init():
        try:
            return module.init(
                jax.random.PRNGKey(0), jnp.zeros(in_shape), train=False)
        except TypeError:  # discriminators take no `train` kwarg
            return module.init(jax.random.PRNGKey(0), jnp.zeros(in_shape))

    vars_ = jax.eval_shape(init)
    return import_torch._torch_shapes(
        entries, vars_["params"], vars_.get("batch_stats", {})
    )


def _report(sd, entries, expected_shapes, key_map, label):
    """Key-set + shape audit.  Returns (strict_ok, renamed)."""
    from mdctgan_tpu.train import import_torch

    req, opt_keys = import_torch.expected_torch_keys(entries)
    expected = set(req) | set(opt_keys)
    present = set(sd)

    renamed = {}
    if key_map:
        # mirror the importer exactly (import_torch.py convert_state_dict):
        # a present key with the WRONG shape counts as missing/not-consumed
        # (the reference's ``param.size() != model_dict[name].size()`` test),
        # so --param_key_map may rename it
        from mdctgan_tpu.train.import_torch import _to_np as _np

        consumed_ok = {
            k for k in expected & present
            if expected_shapes.get(k) is None
            or tuple(expected_shapes[k]) == tuple(np.shape(_np(sd[k])))
        }
        before = set(sd)
        sd2 = import_torch.apply_param_key_map(dict(sd), key_map, consumed_ok)
        for k in set(sd2) - before:
            # find what produced it (apply_param_key_map renames src->dst)
            renamed[k] = "(via --param_key_map)"
        sd.clear()
        sd.update(sd2)
        present = set(sd)

    matched = sorted(present & expected)
    missing = [k for k in req if k not in present]
    leftover = sorted(present - expected)

    shape_bad = []
    for k in matched:
        want = expected_shapes.get(k)
        got = tuple(np.shape(import_torch._to_np(sd[k])))
        if want is not None and tuple(want) != got:
            shape_bad.append((k, want, got))

    print(f"[{label}] expected keys: {len(req)} required"
          f" + {len(opt_keys)} optional")
    print(f"[{label}] matched: {len(matched)}"
          + (f" ({len(renamed)} via --param_key_map)" if renamed else ""))
    if missing:
        print(f"[{label}] MISSING ({len(missing)}):")
        by_shape = {}
        for k in leftover:
            by_shape.setdefault(
                tuple(np.shape(import_torch._to_np(sd[k]))), []).append(k)
        for k in missing:
            cands = by_shape.get(tuple(expected_shapes.get(k, ())), [])
            hint = f"   <- size-matched candidates: {cands}" if cands else ""
            print(f"    {k}  (expected {expected_shapes.get(k)}){hint}")
    if leftover:
        print(f"[{label}] leftover (ignored by the importer,"
              f" {len(leftover)}): {leftover[:6]}"
              + (" ..." if len(leftover) > 6 else ""))
    if shape_bad:
        print(f"[{label}] SHAPE MISMATCH ({len(shape_bad)}):")
        for k, want, got in shape_bad:
            print(f"    {k}: expected {tuple(want)}, file has {got}")
    ok = not missing and not shape_bad
    print(f"[{label}] strict load: {'OK — 100% matched' if ok else 'WOULD FALL BACK (see above)'}")
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("pth", help="path to a *_net_G.pth or *_net_D.pth")
    ap.add_argument("--net", choices=["auto", "G", "D"], default="auto")
    ap.add_argument("--forward", action="store_true",
                    help="import for real and run one deterministic forward")
    args, rest = ap.parse_known_args(argv)

    from mdctgan_tpu.options import TrainOptions, spectral_config_from_opt
    from mdctgan_tpu.train import import_torch

    # model flags only; keep opt.txt/side effects out of the user's way
    opt = TrainOptions().parse(
        ["--checkpoints_dir", tempfile.mkdtemp(prefix="verify_import_"),
         "--name", "audit"] + rest,
        save=False,
    )

    net = args.net
    if net == "auto":
        base = os.path.basename(args.pth)
        net = "D" if base.endswith("_net_D.pth") else "G"
        print(f"[verify] net kind inferred from filename: {net}")

    sd = import_torch.load_pth(args.pth)
    sd = {k: import_torch._to_np(v) for k, v in sd.items()}
    cfg = spectral_config_from_opt(opt)
    h, w = cfg.n_bins, cfg.n_fft // 2
    key_map = getattr(opt, "param_key_map", None) or None

    if net == "G":
        from mdctgan_tpu.models.generator import build_generator

        module = build_generator(opt)
        entries = import_torch.generator_entries_for(module)
        in_shape = (1, h, w, opt.input_nc)
    else:
        from mdctgan_tpu.models.discriminator import build_discriminator

        module = build_discriminator(opt)
        entries = import_torch.discriminator_entries(opt.num_D, opt.n_layers_D)
        in_shape = (1, h, w, opt.input_nc + opt.output_nc)

    shapes = _expected_shapes(entries, module, in_shape)
    ok = _report(sd, entries, shapes, key_map, f"net_{net}")

    if args.forward:
        print(f"[net_{net}] importing + forward (this initializes the module"
              " — may take a minute on large geometries)...")
        if net == "G":
            init_vars = module.init(
                jax.random.PRNGKey(0), jnp.zeros(in_shape), train=False)
            params, stats = import_torch.import_generator(
                sd, module, param_key_map=key_map, init_vars=init_vars)
            x = 0.1 * jnp.sin(
                jnp.arange(np.prod(in_shape), dtype=jnp.float32)
            ).reshape(in_shape)
            y = module.apply(
                {"params": params, "batch_stats": stats}, x, train=False)
        else:
            init_vars = module.init(jax.random.PRNGKey(0), jnp.zeros(in_shape))
            params = import_torch.import_discriminator(
                sd, opt.num_D, opt.n_layers_D, param_key_map=key_map,
                init_params=init_vars["params"])
            x = 0.1 * jnp.sin(
                jnp.arange(np.prod(in_shape), dtype=jnp.float32)
            ).reshape(in_shape)
            y = module.apply({"params": params}, x)
            y = y[-1][-1]  # final scale's final logits
        arr = np.asarray(y, np.float32)
        digest = hashlib.sha256(
            np.round(arr.astype(np.float64), 4).tobytes()).hexdigest()[:16]
        print(f"[net_{net}] forward OK: out shape {arr.shape}, "
              f"mean {arr.mean():+.6f}, std {arr.std():.6f}, "
              f"checksum(1e-4) {digest}")

    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
