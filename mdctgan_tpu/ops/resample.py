"""On-device polyphase sinc resampling.

The reference degrades training audio on the HOST through torchaudio's C++
resampler, three calls per sample, inside DataLoader worker processes
(reference: data/audio_dataset.py:66-71).  On TPU the same windowed-sinc
polyphase filter is a single strided conv1d that runs on-device inside the
jitted input-processing step, so the degradation pipeline (down-up resample
simulation + noise) never touches the host.

Kernel construction follows the standard windowed-sinc polyphase design
(identical math to torchaudio's ``sinc_interp_hann``: lowpass_filter_width=6,
rolloff=0.99, Hann^2 window) so waveforms match the reference pipeline.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=32)
def sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int]:
    """Polyphase kernels (new_freq//g phases, taps) and the half-width.

    Built in float64 on the host, once per (orig, new) pair.
    """
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    phase = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new
    t = (phase + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels *= window * (base_freq / orig)
    return kernels.astype(np.float32), width


def resample(
    waveform: Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Array:
    """Resample ``(..., T)`` from orig_freq to new_freq on-device.

    Output length is ceil(T * new / orig), matching the host resamplers.
    """
    if orig_freq == new_freq:
        return waveform
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    kernels, width = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    t = waveform.shape[-1]
    lead = waveform.shape[:-1]
    x = waveform.reshape(-1, 1, t)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    # conv: batch (N,1,T') * kernels (new, 1, K), stride orig -> (N, new, F)
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernels)[:, None, :],
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    # interleave phases: (N, new, F) -> (N, F*new)
    y = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], -1)
    target_len = int(math.ceil(t * new / orig))
    return y[:, :target_len].reshape(*lead, target_len)


def degrade_lr(
    waveform: Array,
    orig_freq: int,
    lr_freq: int,
    hr_freq: int,
) -> Array:
    """Resample-down-up degradation simulation (audio_dataset.py:66-71):
    orig -> lr -> hr, producing the band-limited LR waveform at HR rate."""
    lr = resample(waveform, orig_freq, lr_freq)
    return resample(lr, lr_freq, hr_freq)


def add_noise_snr(waveform: Array, rng: Array, snr_db: float, segment_length: int) -> Array:
    """SNR-calibrated additive noise (audio_dataset.py:72-78)."""
    noise = jax.random.normal(rng, waveform.shape, waveform.dtype)
    # Per-sample mean/std: the reference normalizes each sample's noise
    # individually (one waveform per DataLoader item).
    noise = noise - jnp.mean(noise, axis=-1, keepdims=True)
    signal_power = jnp.sum(waveform ** 2, axis=-1, keepdims=True) / segment_length
    noise_var = signal_power / (10.0 ** (snr_db / 10.0))
    noise = jnp.sqrt(noise_var) / jnp.std(noise, axis=-1, keepdims=True) * noise
    return waveform + noise


def fix_length(waveform: Array, length: int) -> Array:
    """Pad-or-crop to a fixed length (audio_dataset.py:102-110) — keeps every
    shape static for XLA."""
    t = waveform.shape[-1]
    if t >= length:
        return waveform[..., :length]
    pad = [(0, 0)] * (waveform.ndim - 1) + [(0, length - t)]
    return jnp.pad(waveform, pad)
