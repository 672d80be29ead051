"""Metrics parity: MSE/SNR/LSD vs a float64 NumPy transcription of the
reference ``compute_matrics`` (util/util.py:132-177).  torchaudio is not
available offline, so the oracle re-derives torch.stft's conventions
(center reflect-pad n_fft//2, onesided power spectrogram, (freq, time)
layout) in NumPy."""

import numpy as np
import jax.numpy as jnp

from mdctgan_tpu.ops.metrics import compute_metrics, lsd, snr_db
from mdctgan_tpu.ops.window import kbd_window


def _np_stft_power(x, n_fft, hop, win, window, center=True):
    if center:
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)],
                   mode="reflect")
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = x[..., idx] * window
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    return np.swapaxes(np.abs(spec) ** 2, -1, -2)  # (..., freq, time)


def _reference_metrics(hr, lr, sr, n_fft=512, hop=256, win=512, center=True):
    """util/util.py:132-177 in float64 numpy."""
    mse = np.mean((sr - hr) ** 2)
    snr_sr = np.mean(
        10 * np.log10(np.sum(hr ** 2, -1) / np.sum((sr - hr) ** 2, -1))
    )
    snr_lr = np.mean(
        10 * np.log10(np.sum(hr ** 2, -1) / np.sum((lr - hr) ** 2, -1))
    )
    w = np.asarray(kbd_window(2 * win), np.float64)
    hs = _np_stft_power(hr, 2 * n_fft, 2 * hop, 2 * win, w, center)
    ss = _np_stft_power(sr, 2 * n_fft, 2 * hop, 2 * win, w, center)
    lsd_v = np.mean(
        np.sqrt(np.mean((np.log10(hs + 1e-6) - np.log10(ss + 1e-6)) ** 2, axis=-2))
    )
    return mse, snr_sr, snr_lr, lsd_v


def test_metrics_match_reference_recipe(rng):
    t = 8192
    hr = rng.standard_normal((2, t)).astype(np.float64) * 0.3
    sr = hr + 0.05 * rng.standard_normal((2, t))
    lr = hr + 0.1 * rng.standard_normal((2, t))
    m_ref = _reference_metrics(hr, lr, sr)
    m = compute_metrics(
        jnp.asarray(hr, jnp.float32), jnp.asarray(lr, jnp.float32),
        jnp.asarray(sr, jnp.float32),
    )
    np.testing.assert_allclose(float(m["mse"]), m_ref[0], rtol=1e-4)
    np.testing.assert_allclose(float(m["snr_sr"]), m_ref[1], rtol=1e-4)
    np.testing.assert_allclose(float(m["snr_lr"]), m_ref[2], rtol=1e-4)
    np.testing.assert_allclose(float(m["lsd"]), m_ref[3], rtol=1e-3)


def test_snr_identity_is_infinite_free(rng):
    x = jnp.asarray(rng.standard_normal((1, 1000)), jnp.float32)
    v = float(snr_db(x, x * 0.999))
    assert np.isfinite(v) and v > 40


def test_lsd_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    assert float(lsd(x, x)) == 0.0
