"""Metrics parity: MSE/SNR/LSD vs a float64 NumPy transcription of the
reference ``compute_matrics`` (util/util.py:132-177).  torchaudio is not
available offline, so the oracle re-derives torch.stft's conventions
(center reflect-pad n_fft//2, onesided power spectrogram, (freq, time)
layout) in NumPy."""

import numpy as np
import jax.numpy as jnp

from mdctgan_tpu.ops.metrics import compute_metrics, lsd, snr_db, snr_seg
from mdctgan_tpu.ops.window import kbd_window


def _pysepm_snr_seg(clean, processed, fs, frame_len=0.03, overlap=0.75):
    """float64 transcription of pysepm.SNRseg (the metric the reference's
    dead code at util/util.py:146-148 would have called)."""
    eps = np.finfo(np.float64).eps
    winlength = int(round(frame_len * fs))
    skiprate = int(np.floor((1 - overlap) * frame_len * fs))
    n = np.arange(1, winlength + 1)
    window = 0.5 * (1 - np.cos(2 * np.pi * n / (winlength + 1)))
    step = skiprate
    n_frames = (clean.shape[-1] - (winlength - skiprate)) // step
    idx = np.arange(n_frames)[:, None] * step + np.arange(winlength)[None, :]
    cf = clean[..., idx] * window
    pf = processed[..., idx] * window
    sig = np.sum(cf**2, -1)
    noi = np.sum((cf - pf) ** 2, -1)
    seg = 10 * np.log10(sig / (noi + eps) + eps)
    seg = np.clip(seg, -10.0, 35.0)[..., :-1]
    return np.mean(seg)


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


def test_snr_seg_matches_pysepm_recipe(rng):
    fs = 48000
    t = 32512
    hr = rng.standard_normal((2, t)).astype(np.float64) * 0.3
    sr = hr + 0.05 * rng.standard_normal((2, t))
    ref = _pysepm_snr_seg(hr, sr, fs)
    got = float(snr_seg(jnp.asarray(hr, jnp.float32),
                        jnp.asarray(sr, jnp.float32), fs))
    np.testing.assert_allclose(got, ref, rtol=1e-3)
    # at 16 kHz the frame geometry changes (480-sample frames, 120 hop)
    ref16 = _pysepm_snr_seg(hr[..., :16000], sr[..., :16000], 16000)
    got16 = float(snr_seg(jnp.asarray(hr[..., :16000], jnp.float32),
                          jnp.asarray(sr[..., :16000], jnp.float32), 16000))
    np.testing.assert_allclose(got16, ref16, rtol=1e-3)


def test_snr_seg_short_audio_is_nan(rng):
    # < one 30 ms frame (1440 samples at 48 kHz): NaN, not a crash — batch
    # metric runs must survive degenerate clips
    x = jnp.asarray(rng.standard_normal((1, 1000)), jnp.float32)
    assert np.isnan(float(snr_seg(x, x, 48000)))


def test_snr_seg_clamps(rng):
    x = jnp.asarray(rng.standard_normal((1, 32512)), jnp.float32)
    # identical signals: every frame pins at the +35 dB cap
    assert float(snr_seg(x, x, 48000)) == 35.0
    # anti-correlated noise dominating: pins at the -10 dB floor
    assert float(snr_seg(x, -100.0 * x, 48000)) == -10.0


def test_compute_metrics_includes_snr_seg(rng):
    t = 8192
    hr = rng.standard_normal((2, t)).astype(np.float64) * 0.3
    sr = hr + 0.05 * rng.standard_normal((2, t))
    m = compute_metrics(jnp.asarray(hr, jnp.float32),
                        jnp.asarray(hr, jnp.float32),
                        jnp.asarray(sr, jnp.float32), fs=48000)
    assert list(m) == ["mse", "snr_sr", "snr_lr", "snr_seg", "lsd"]
    np.testing.assert_allclose(
        float(m["snr_seg"]), _pysepm_snr_seg(hr, sr, 48000), rtol=1e-3
    )


def test_snr_identity_is_infinite_free(rng):
    x = jnp.asarray(rng.standard_normal((1, 1000)), jnp.float32)
    v = float(snr_db(x, x * 0.999))
    assert np.isfinite(v) and v > 40


def test_lsd_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    assert float(lsd(x, x)) == 0.0


def test_nanmean_rows_skips_degenerate_snr_seg(rng):
    from mdctgan_tpu.ops.metrics import nanmean_rows

    # one degenerate (sub-frame) clip in a batch: its snr_seg is NaN ...
    short = jnp.asarray(rng.standard_normal((1, 1000)), jnp.float32)
    long_ = jnp.asarray(rng.standard_normal((1, 8192)), jnp.float32)
    m_short = {k: float(v) for k, v in compute_metrics(
        short, short, short, fs=48000).items()}
    m_long = {k: float(v) for k, v in compute_metrics(
        long_, long_, long_, fs=48000).items()}
    assert np.isnan(m_short["snr_seg"]) and np.isfinite(m_long["snr_seg"])
    # ... but the aggregate keeps the column live (VERDICT r3 weak #3)
    avg = nanmean_rows([m_short, m_long])
    assert avg["snr_seg"] == m_long["snr_seg"]
    assert np.isfinite(avg["mse"])
    # an all-NaN column stays NaN rather than raising
    assert np.isnan(nanmean_rows([m_short, m_short])["snr_seg"])
