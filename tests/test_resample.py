"""Resampler tests: tone preservation, band-limiting, length formula, and the
degradation pipeline (reference behavior: data/audio_dataset.py:66-78)."""

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.ops.resample import (
    add_noise_snr,
    degrade_lr,
    fix_length,
    resample,
    sinc_resample_kernel,
)


def tone(freq_hz, sr, t=1.0):
    n = int(sr * t)
    return np.sin(2 * np.pi * freq_hz * np.arange(n) / sr).astype(np.float32)


def test_length_formula():
    x = jnp.zeros((2, 32512))
    y = resample(x, 48000, 16000)
    assert y.shape == (2, int(np.ceil(32512 * 16000 / 48000)))
    z = resample(y, 16000, 48000)
    assert z.shape[-1] == int(np.ceil(y.shape[-1] * 3))


def test_identity():
    x = jnp.ones((1, 100))
    assert resample(x, 48000, 48000) is x


def test_tone_preserved_below_nyquist():
    sr_in, sr_out = 48000, 16000
    x = tone(1000, sr_in)
    y = np.asarray(resample(jnp.asarray(x)[None], sr_in, sr_out))[0]
    ref = tone(1000, sr_out)
    # ignore filter edges
    m = slice(200, -200)
    err = np.abs(y[m] - ref[: len(y)][m]).max()
    assert err < 2e-2, err


def test_band_limiting():
    """A tone above the LR Nyquist must vanish after down-up degradation."""
    sr = 48000
    hi = tone(15000, sr)  # above 8k Nyquist of 16k rate
    lo = tone(1000, sr)
    out_hi = np.asarray(degrade_lr(jnp.asarray(hi)[None], sr, 16000, sr))[0]
    out_lo = np.asarray(degrade_lr(jnp.asarray(lo)[None], sr, 16000, sr))[0]
    assert np.abs(out_hi[500:-500]).max() < 0.05
    assert np.abs(out_lo[500:-500]).max() > 0.9


def test_upsample_3x_tone():
    x = tone(1000, 16000)
    y = np.asarray(resample(jnp.asarray(x)[None], 16000, 48000))[0]
    ref = tone(1000, 48000)
    m = slice(600, -600)
    assert np.abs(y[m] - ref[: len(y)][m]).max() < 2e-2


def test_kernel_cache_and_shape():
    k1, w1 = sinc_resample_kernel(48000, 16000)
    k2, _ = sinc_resample_kernel(48000, 16000)
    assert k1 is k2  # lru cached
    assert k1.shape[0] == 1  # 16000/gcd = 1 phase
    k3, _ = sinc_resample_kernel(16000, 48000)
    assert k3.shape[0] == 3


def test_add_noise_snr(rng):
    x = jnp.asarray(rng.standard_normal((2, 32512)), jnp.float32)
    y = add_noise_snr(x, jax.random.PRNGKey(0), snr_db=55.0, segment_length=32512)
    noise = np.asarray(y - x)
    sig_p = np.sum(np.asarray(x) ** 2) / x.size
    noise_p = np.sum(noise ** 2) / noise.size
    snr = 10 * np.log10(sig_p / noise_p)
    assert 50 < snr < 60


def test_fix_length():
    assert fix_length(jnp.zeros((2, 10)), 16).shape == (2, 16)
    assert fix_length(jnp.zeros((2, 20)), 16).shape == (2, 16)
