#!/usr/bin/env python
"""Serving export: serialize the jitted inference graph to StableHLO.

No reference equivalent — the reference's deployment story stops at vestigial
ONNX/TRT flags that are parsed but never used (test_options.py:14-16).  Here
the whole inference stack (MDCT -> normalize -> G -> denormalize -> IMDCT,
weights baked in as constants) exports through ``jax.export`` to a portable
StableHLO artifact that a C++/PJRT serving runtime — or any later JAX
process, no model code needed — can load and execute.

Usage (same spectral/model flags as generate_audio.py):

    python -m mdctgan_tpu.export_cli --load_pretrain <ckpt-dir> \
        --export_path model.stablehlo --export_batch 8 \
        --export_platforms tpu,cpu ...model flags...

Reload without any mdctgan code:

    import jax.export, jax.numpy as jnp
    fn = jax.export.deserialize(open("model.stablehlo", "rb").read())
    sr_segments = fn.call(lr_segments)   # (B, segment_length) float32
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mdctgan_tpu.models.generator import build_generator
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.options import TrainOptions, spectral_config_from_opt, use_fused_from_opt
from mdctgan_tpu.train.restore import load_generator_vars
from mdctgan_tpu.train.step import build_inference_fn


def export_inference(opt) -> bytes:
    """Build + restore the model per ``opt`` and serialize the inference fn
    (weights baked in) for ``opt.export_platforms``."""
    cfg = spectral_config_from_opt(opt)
    platforms = [p.strip() for p in opt.export_platforms.split(",") if p.strip()]
    use_fused = use_fused_from_opt(opt)
    if use_fused is None and platforms != ["tpu"]:
        # The fused Pallas kernels lower only for the tpu platform, so "auto"
        # must not engage them in a multi-platform (or non-TPU) artifact —
        # it would make the export crash (or depend on the export host's
        # attached devices).  An explicit --fused_mdct on still forces them
        # and fails loudly.
        use_fused = False
    transform = SpectralTransform(cfg, use_fused=use_fused)
    generator = build_generator(opt)
    g_vars = load_generator_vars(opt, generator, cfg)
    infer = build_inference_fn(generator, transform, out_length=cfg.segment_length)

    @jax.jit
    def serve(lr_segments: jax.Array) -> jax.Array:
        _, sr_audio = infer(g_vars, lr_segments)
        return sr_audio[..., : cfg.segment_length]

    spec = jax.ShapeDtypeStruct((opt.export_batch, cfg.segment_length), jnp.float32)
    exported = jax.export.export(serve, platforms=platforms)(spec)
    return exported.serialize()


def main() -> None:
    from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env

    honor_jax_platforms_env()
    opt = TrainOptions().parse(save=False)
    if not opt.export_path:
        raise SystemExit("--export_path is required")
    blob = export_inference(opt)
    with open(opt.export_path, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes of StableHLO "
          f"({opt.export_platforms}, batch {opt.export_batch}) "
          f"to {opt.export_path}")


if __name__ == "__main__":
    main()
