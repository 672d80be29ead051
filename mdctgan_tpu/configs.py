"""Canonical configurations.

``flagship()`` is the training configuration of record (reference
train.sh:3-17): VCTK 16->48 kHz, arcsinh gain 1000, abs_norm [-5,5]->[-1,1],
netG local / ngf 56 / 3 downsamples / 4 global resblocks + 3 attention blocks
(6 heads x 128), fit_residual, interpolate-up + resconv-down, num_D 3.
"""

from __future__ import annotations

from mdctgan_tpu.models.discriminator import MultiscaleDiscriminator
from mdctgan_tpu.models.generator import GlobalGenerator, LocalEnhancer
from mdctgan_tpu.ops.features import SpectralConfig


def flagship_spectral() -> SpectralConfig:
    return SpectralConfig(
        n_fft=512,
        hop_length=256,
        win_length=512,
        center=True,
        lr_sampling_rate=16000,
        hr_sampling_rate=48000,
        sr_sampling_rate=48000,
        segment_length=32512,
        arcsinh_transform=True,
        arcsinh_gain=1000.0,
        abs_norm=True,
        src_range=(-5.0, 5.0),
        norm_range=(-1.0, 1.0),
        fit_residual=True,
        abs_spectro=True,
    )


def flagship_generator(dtype=None) -> LocalEnhancer:
    return LocalEnhancer(
        dtype=dtype,
        input_nc=2,
        output_nc=1,
        ngf=56,
        n_downsample_global=3,
        n_blocks_global=4,
        n_local_enhancers=1,
        n_blocks_local=3,
        n_attn_global=3,
        n_attn_local=0,
        input_size=(128, 256),
        proj_factor_g=4,
        heads_g=6,
        dim_head_g=128,
        downsample_type="resconv",
        upsample_type="interpolate",
    )


def flagship_discriminator(dtype=None) -> MultiscaleDiscriminator:
    return MultiscaleDiscriminator(ndf=64, n_layers=3, num_D=3, dtype=dtype)


def tiny_spectral() -> SpectralConfig:
    """Small geometry for tests/dry runs: spectro (32, 32)."""
    return SpectralConfig(
        n_fft=64, hop_length=32, win_length=64, segment_length=992,
    )


def tiny_generator() -> GlobalGenerator:
    return GlobalGenerator(
        input_nc=2, output_nc=1, ngf=4, n_downsampling=2, n_blocks=1,
        n_attn=1, heads=2, dim_head=4, input_size=(32, 32),
        downsample_type="resconv", upsample_type="interpolate",
    )


def tiny_discriminator() -> MultiscaleDiscriminator:
    return MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
