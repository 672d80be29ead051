"""Audio-quality metrics: MSE, SNR, segmental SNR, LSD.

Port of the reference ``compute_matrics`` (util/util.py:132-177).  LSD is
computed from a 2x-resolution STFT power spectrogram with a KBD window
(util/util.py:171-175): log10(|STFT|^2 + 1e-6), RMSE over frequency, mean.
The reference stubs out segmental SNR and PESQ (pysepm removed; the dead
calls at util/util.py:146-168 would have used ``pysepm.SNRseg``/``pesq``
and write constant zeros into eval.csv).  Segmental SNR is implemented
natively here with the pysepm.SNRseg recipe so the column is live; PESQ
(ITU-T P.862, a full psychoacoustic model) stays absent.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.ops.window import kbd_window

Array = jax.Array


def mse(a: Array, b: Array) -> Array:
    return jnp.mean((a - b) ** 2)


def snr_db(signal: Array, estimate: Array) -> Array:
    """SNR of `estimate` against reference `signal` (util/util.py:139-143)."""
    num = jnp.sum(signal ** 2, axis=-1)
    den = jnp.sum((signal - estimate) ** 2, axis=-1)
    return jnp.mean(10.0 * jnp.log10(num / jnp.maximum(den, 1e-20)))


def snr_seg(
    signal: Array,
    estimate: Array,
    fs: int,
    frame_len: float = 0.03,
    overlap: float = 0.75,
    min_snr: float = -10.0,
    max_snr: float = 35.0,
) -> Array:
    """Segmental SNR of `estimate` against `signal`, pysepm.SNRseg recipe
    (the call the reference left commented at util/util.py:146-148): 30 ms
    Hann-windowed frames at 75% overlap, per-frame SNR clamped to
    [-10, 35] dB, last (partial-energy) frame dropped, mean over frames.

    Audio shorter than one frame has no defined segmental SNR; returns NaN
    rather than raising so batch metric runs survive degenerate clips."""
    eps = float(np.finfo(np.float64).eps)
    winlength = int(round(frame_len * fs))
    skiprate = int(np.floor((1.0 - overlap) * frame_len * fs))
    t = signal.shape[-1]
    if t < winlength:
        return jnp.asarray(jnp.nan, signal.dtype)
    n_frames = 1 + (t - winlength) // skiprate
    # pysepm's Hann variant: 0.5*(1-cos(2*pi*(1..N)/(N+1)))
    n = np.arange(1, winlength + 1)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (winlength + 1)))
    idx = (
        np.arange(n_frames)[:, None] * skiprate + np.arange(winlength)[None, :]
    )
    w = jnp.asarray(window, signal.dtype)
    sf = signal[..., idx] * w
    ef = estimate[..., idx] * w
    sig_energy = jnp.sum(sf**2, axis=-1)
    noise_energy = jnp.sum((sf - ef) ** 2, axis=-1)
    seg = 10.0 * jnp.log10(sig_energy / (noise_energy + eps) + eps)
    seg = jnp.clip(seg, min_snr, max_snr)
    if n_frames > 1:
        seg = seg[..., :-1]  # pysepm drops the last (partial-energy) frame
    return jnp.mean(seg)


def stft_power(
    audio: Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: np.ndarray,
    center: bool = True,
) -> Array:
    """|STFT|^2 with torch.stft conventions: center reflect-pad by n_fft//2,
    onesided, (..., freq, time) layout."""
    if center:
        pad = [(0, 0)] * (audio.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        audio = jnp.pad(audio, pad, mode="reflect")
    t = audio.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(win_length)[None, :]
    )
    frames = audio[..., idx] * jnp.asarray(window, audio.dtype)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2
    return jnp.swapaxes(power, -1, -2)  # (..., freq, time)


def lsd(
    hr_audio: Array,
    sr_audio: Array,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    center: bool = True,
) -> Array:
    """Log-spectral distance at 2x transform resolution (util/util.py:171-175)."""
    w = kbd_window(2 * win_length)
    hs = stft_power(hr_audio, 2 * n_fft, 2 * hop_length, 2 * win_length, w, center)
    ss = stft_power(sr_audio, 2 * n_fft, 2 * hop_length, 2 * win_length, w, center)
    hl = jnp.log10(hs + 1e-6)
    sl = jnp.log10(ss + 1e-6)
    return jnp.mean(jnp.sqrt(jnp.mean((hl - sl) ** 2, axis=-2)))


def nanmean_rows(rows) -> Dict[str, float]:
    """Per-key NaN-aware mean over a list of metric dicts (host side).

    ``snr_seg`` is NaN for clips shorter than one 30 ms frame (see
    ``snr_seg``); a plain mean would let one degenerate clip blank the whole
    column in eval.csv / metrics.csv MEAN rows.  All-NaN columns stay NaN."""
    out: Dict[str, float] = {}
    for k in rows[0]:
        vals = np.asarray([r[k] for r in rows], np.float64)
        finite = vals[~np.isnan(vals)]
        out[k] = float(finite.mean()) if finite.size else float("nan")
    return out


def compute_metrics(
    hr_audio: Array,
    lr_audio: Array,
    sr_audio: Array,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    center: bool = True,
    fs: int = 48000,
) -> Dict[str, Array]:
    """The reference's metric tuple as a dict: MSE, SNR(SR), SNR(LR),
    segmental SNR(SR) (live here, a dead zero in the reference), LSD."""
    return {
        "mse": mse(hr_audio, sr_audio),
        "snr_sr": snr_db(hr_audio, sr_audio),
        "snr_lr": snr_db(hr_audio, lr_audio),
        "snr_seg": snr_seg(hr_audio, sr_audio, fs),
        "lsd": lsd(hr_audio, sr_audio, n_fft, hop_length, win_length, center),
    }
