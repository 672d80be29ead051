"""High-level model API.

``create_model(opt)`` mirrors the reference factory (models/models.py:3-20 —
pix2pixHD -> train/inference model): it bundles the generator, discriminator,
spectral transform, and jitted step/inference functions built from a parsed
options namespace.  ``upsample(...)`` is the one-call embedding API the
reference serves through ``AudioAppDataset`` (data/audio_dataset.py:187-205).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.data.dataset import AudioAppDataset
from mdctgan_tpu.models.discriminator import build_discriminator
from mdctgan_tpu.models.generator import build_generator
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.ops.resample import degrade_lr, resample
from mdctgan_tpu.options import spectral_config_from_opt, use_fused_from_opt
from mdctgan_tpu.train.schedule import make_optimizers
from mdctgan_tpu.train.state import GANTrainState, create_train_state
from mdctgan_tpu.train.step import build_inference_fn, build_train_step


@dataclasses.dataclass
class Model:
    """The bundle the reference's ``Pix2PixHDModel`` owns as module state."""

    generator: Any
    discriminator: Any
    transform: SpectralTransform
    state: Optional[GANTrainState]
    train_step: Optional[Callable]
    inference: Callable

    def g_vars(self) -> Dict:
        return {
            "params": self.state.g_params,
            "batch_stats": self.state.batch_stats,
        }


def create_model(
    opt,
    rng: Optional[jax.Array] = None,
    is_train: Optional[bool] = None,
    steps_per_epoch: int = 1,
) -> Model:
    """Build the full model bundle from a parsed options namespace
    (reference create_model, models/models.py:3-20 + Pix2PixHDModel.initialize,
    pix2pixHD_model.py:215-364).

    ``steps_per_epoch`` paces the epoch-linear lr decay; with the default of 1
    every optimizer step counts as an epoch, so pass the real value when
    training through this API (train_cli computes it from the dataset size).
    """
    if is_train is None:
        is_train = bool(getattr(opt, "isTrain", True))
    cfg = spectral_config_from_opt(opt)
    transform = SpectralTransform(cfg, use_fused=use_fused_from_opt(opt))
    generator = build_generator(opt)
    discriminator = build_discriminator(opt)
    g_tx, d_tx = make_optimizers(
        getattr(opt, "lr", 2e-4), getattr(opt, "beta1", 0.5),
        getattr(opt, "niter", 100), getattr(opt, "niter_decay", 100),
        steps_per_epoch,
        accum_steps=getattr(opt, "accum_steps", 1),
    )
    state = create_train_state(
        rng if rng is not None else jax.random.PRNGKey(getattr(opt, "seed", 42)),
        generator, discriminator, g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=opt.input_nc,
        d_in_channels=opt.input_nc + opt.output_nc,
    )
    step = None
    if is_train:
        step = build_train_step(
            generator, discriminator, transform, g_tx, d_tx,
            use_lsgan=not getattr(opt, "no_lsgan", False),
            lambda_feat=getattr(opt, "lambda_feat", 10.0),
            n_layers_d=getattr(opt, "n_layers_D", 3),
            num_d=getattr(opt, "num_D", 2),
            use_ganfeat=not getattr(opt, "no_ganFeat_loss", False),
        )
    infer = build_inference_fn(generator, transform, out_length=cfg.segment_length)
    return Model(generator, discriminator, transform, state, step, infer)


def upsample(
    audio: np.ndarray,
    sample_rate: int,
    g_vars: Dict,
    model: Model,
    is_lr_input: bool = False,
    gen_overlap: int = 0,
    batch_size: int = 8,
    mesh=None,
) -> np.ndarray:
    """One-call speech super-resolution of an in-memory waveform: degrade (or
    upsample if ``is_lr_input``), segment, batch-infer, stitch.

    ``mesh``: a ``jax.sharding.Mesh`` to serve data-parallel — segment
    batches shard over the leading axis with replicated ``g_vars`` (pass
    already-replicated vars or plain ones; device_put replicates them).
    ``batch_size`` must divide by the mesh size."""
    cfg = model.transform.cfg
    sharding = None
    if mesh is not None:
        from mdctgan_tpu.parallel.mesh import batch_sharding, replicate

        if batch_size % mesh.size:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size {mesh.size}"
            )
        sharding = batch_sharding(mesh)
        g_vars = replicate(g_vars, mesh)
    ds = AudioAppDataset(audio, sample_rate, cfg.segment_length, gen_overlap)
    raw = jnp.asarray(ds.raw_audio)[None]
    if is_lr_input:
        lr = resample(raw, sample_rate, cfg.hr_sampling_rate)
    else:
        lr = degrade_lr(raw, sample_rate, cfg.lr_sampling_rate, cfg.hr_sampling_rate)
    segments = ds.segments_of(np.asarray(lr)[0])
    n = len(segments)
    n_pad = (-n) % batch_size
    if n_pad:
        segments = np.concatenate(
            [segments, np.zeros((n_pad, cfg.segment_length), np.float32)]
        )
    outs = []
    for i in range(0, len(segments), batch_size):
        x = segments[i : i + batch_size]
        x = jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)
        _, sr_audio = model.inference(g_vars, x)
        outs.append(np.asarray(sr_audio[..., : cfg.segment_length]))
    sr_segments = np.concatenate(outs)[:n]
    # crop the segment-padding tail so output duration matches the input's
    # rate-converted length — without this a clip that doesn't fill the last
    # segment returns up to segment_length-1 synthesized-from-zeros samples
    out_len = int(round(len(ds.raw_audio) * cfg.hr_sampling_rate / sample_rate))
    return ds.stitch(sr_segments)[:out_len]
