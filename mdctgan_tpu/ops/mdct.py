"""MDCT / IMDCT as MXU matmuls.

The reference computes the MDCT through a pre-twiddle -> FFT -> post-twiddle
pipeline on cuFFT (reference: models/mdct.py:359-489 ``MDCT4``/``IMDCT4``) and
a scatter-add based N/4-point variant on torch_scatter
(models/mdct.py:492-747 ``FastMDCT4``/``FastIMDCT4``).  Algebraically both
compute the same real transform

    X[k] = sum_n  x[n] w[n] cos( (2*pi/N) * (n + 1/2 + N/4) * (k + 1/2) )

for ``n in [0, N)`` and ``k in [0, N/2)``.  On TPU the natural formulation is a
dense matmul against the precomputed (N, N/2) cosine kernel: for the default
``n_fft=512`` the whole transform is a (B*F, 512) @ (512, 256) matmul that maps
straight onto the MXU, with the analysis window folded into the kernel matrix.
This removes the FFT, the scatter-add, and the complex twiddles entirely.

Framing exploits ``hop = win/2``: the signal is reshaped into hop-sized chunks
and each frame is the concatenation of two adjacent chunks — two strided views
and one concat instead of an ``unfold`` gather.  Overlap-add in the inverse is
the reverse: with ``center=True`` the cropped output is exactly
``frames[:, :-1, hop:] + frames[:, 1:, :hop]`` — no scatter needed.

The cosine kernels are built on the host in float64 (the reference bakes
float64 twiddles, models/mdct.py:387-390) and cast once.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.ops.window import kbd_window

Array = jax.Array


@functools.lru_cache(maxsize=16)
def _mdct_matrix_f64(n_fft: int) -> np.ndarray:
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2, dtype=np.float64)[None, :]
    return np.cos((2.0 * np.pi / n_fft) * (n + 0.5 + n_fft / 4.0) * (k + 0.5))


def mdct_matrix(
    n_fft: int,
    window: Optional[np.ndarray] = None,
    dtype=np.float32,
) -> np.ndarray:
    """(N, N/2) forward-MDCT kernel with the analysis window folded in."""
    m = _mdct_matrix_f64(n_fft)
    if window is not None:
        w = np.zeros(n_fft, dtype=np.float64)
        w[: len(window)] = np.asarray(window, dtype=np.float64)
        m = w[:, None] * m
    return m.astype(dtype)


def _resolve_window(
    window: Union[np.ndarray, str, None], win_length: int
) -> Optional[np.ndarray]:
    if window is None:
        return None
    if isinstance(window, str):
        if window == "kbd":
            return kbd_window(win_length)
        if window in ("ones", "rect"):
            return np.ones(win_length, dtype=np.float64)
        raise ValueError(f"unknown window {window!r}")
    return np.asarray(window, dtype=np.float64)


def frame_signal(
    signal: Array,
    win_length: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "constant",
) -> Array:
    """Slice ``(..., T)`` into overlapped windows ``(..., F, win_length)``.

    Matches the reference's padding scheme (models/mdct.py:392-407 — modulo the
    reference's batch/time-axis bug, which FastMDCT4 fixes at mdct.py:604-613):
    ``center=True`` pads ``hop`` on both ends, plus end padding up to a multiple
    of ``hop``.
    """
    t = signal.shape[-1]
    start_pad = hop_length if center else 0
    end_pad = start_pad + (-t) % hop_length
    pad_widths = [(0, 0)] * (signal.ndim - 1) + [(start_pad, end_pad)]
    signal = jnp.pad(signal, pad_widths, mode=pad_mode)

    total = signal.shape[-1]
    if win_length % hop_length == 0:
        # Frames are concatenations of win//hop adjacent hop-sized chunks:
        # pure reshapes + slices, XLA-friendly, no gather.
        ratio = win_length // hop_length
        n_chunks = total // hop_length
        n_frames = n_chunks - ratio + 1
        chunks = signal[..., : n_chunks * hop_length].reshape(
            *signal.shape[:-1], n_chunks, hop_length
        )
        parts = [chunks[..., i : i + n_frames, :] for i in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    # General fallback: gather with static indices.
    n_frames = (total - win_length) // hop_length + 1
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(win_length)[None, :]
    )
    return signal[..., idx]


def overlap_add(
    frames: Array, hop_length: int, center: bool = True
) -> Array:
    """Overlap-add ``(..., F, win)`` back to a signal.

    With ``center=True`` the first/last half-window that the forward transform
    padded in is cropped away (reference: models/mdct.py:479-486).
    """
    win_length = frames.shape[-1]
    if win_length == 2 * hop_length and center:
        # Cropped OLA is exactly the sum of adjacent half-frames.
        out = frames[..., :-1, hop_length:] + frames[..., 1:, :hop_length]
        return out.reshape(*out.shape[:-2], -1)
    if win_length % hop_length == 0:
        ratio = win_length // hop_length
        n_frames = frames.shape[-2]
        n_chunks = n_frames + ratio - 1
        out = jnp.zeros((*frames.shape[:-2], n_chunks, hop_length), frames.dtype)
        split = frames.reshape(*frames.shape[:-1], ratio, hop_length)
        for i in range(ratio):
            out = out.at[..., i : i + n_frames, :].add(split[..., i, :])
        out = out.reshape(*out.shape[:-2], -1)
        if center:
            out = out[..., win_length // 2 : -(win_length // 2)]
        return out
    raise NotImplementedError("overlap_add requires win_length % hop_length == 0")


class MDCT:
    """Forward MDCT: waveform ``(..., T)`` -> spectrum ``(..., F, n_fft//2)``.

    TPU-native replacement for the reference ``MDCT4``/``FastMDCT4`` modules
    (models/mdct.py:359-425, 492-628).

    ``method="matmul"`` (default): windowing + DCT-IV as one MXU matmul — the
    fast path on TPU for the shipped n_fft=512 (the whole transform is a
    (B*F, 512) @ (512, 256) contraction).

    ``method="fft"``: the reference's twiddle/FFT factorization (pre-twiddle
    exp(-i*pi*n/N) -> N-point FFT -> post-twiddle real part) on the XLA FFT —
    the algorithmic analogue of MDCT4/FastMDCT4 for large n_fft where
    O(N log N) beats the dense matmul.  Both methods agree to fp32 precision
    (tests/test_mdct.py).
    """

    def __init__(
        self,
        n_fft: int = 512,
        hop_length: Optional[int] = None,
        win_length: Optional[int] = None,
        window: Union[np.ndarray, str, None] = "kbd",
        center: bool = True,
        pad_mode: str = "constant",
        dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        method: str = "matmul",
    ):
        self.n_fft = n_fft
        self.win_length = int(win_length or n_fft)
        self.hop_length = int(hop_length or self.win_length // 2)
        self.center = center
        self.pad_mode = pad_mode
        self.precision = precision
        if method not in ("matmul", "fft"):
            raise ValueError(f"unknown MDCT method {method!r}")
        self.method = method
        if self.win_length > n_fft:
            raise ValueError("win_length must be <= n_fft")
        if self.hop_length > self.win_length:
            raise ValueError("hop_length must be <= win_length")
        win = _resolve_window(window, self.win_length)
        self.window = win
        # Kernel includes the window and any zero-padding rows up to n_fft.
        self.kernel = jnp.asarray(
            mdct_matrix(n_fft, win if win is not None else np.ones(self.win_length)),
            dtype=dtype,
        )
        if method == "fft":
            n = np.arange(n_fft, dtype=np.float64)
            k = np.arange(1, n_fft, 2, dtype=np.float64)
            self._pre = jnp.asarray(np.exp(-1j * np.pi / n_fft * n), jnp.complex64)
            self._post = jnp.asarray(
                np.exp(-1j * (np.pi / (2 * n_fft) + np.pi / 4) * k), jnp.complex64
            )
            w = np.zeros(n_fft)
            w[: self.win_length] = (
                np.ones(self.win_length) if win is None else win
            )
            self._win_padded = jnp.asarray(w, dtype)

    def __call__(self, signal: Array) -> Array:
        frames = frame_signal(
            signal, self.win_length, self.hop_length, self.center, self.pad_mode
        )
        if self.method == "fft":
            # reference MDCT4.forward math (models/mdct.py:408-425)
            f = frames
            if self.win_length < self.n_fft:
                pad = [(0, 0)] * (f.ndim - 1) + [(0, self.n_fft - self.win_length)]
                f = jnp.pad(f, pad)
            f = f * self._win_padded
            spec = jnp.fft.fft(f * self._pre, axis=-1)[..., : self.n_fft // 2]
            return jnp.real(self._post * spec)
        return jnp.matmul(
            frames, self.kernel[: self.win_length], precision=self.precision
        )


class IMDCT:
    """Inverse MDCT: spectrum ``(..., F, n_fft//2)`` -> waveform ``(..., T)``.

    Mirrors the reference ``IMDCT4`` (models/mdct.py:428-489): synthesis frames
    are ``(4/n_fft) * X @ C^T * window``, overlap-added and center-cropped.
    """

    def __init__(
        self,
        n_fft: int = 512,
        hop_length: Optional[int] = None,
        win_length: Optional[int] = None,
        window: Union[np.ndarray, str, None] = "kbd",
        center: bool = True,
        out_length: Optional[int] = None,
        dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        method: str = "matmul",
    ):
        self.n_fft = n_fft
        self.win_length = int(win_length or n_fft)
        self.hop_length = int(hop_length or self.win_length // 2)
        self.center = center
        self.out_length = out_length
        self.precision = precision
        if method not in ("matmul", "fft"):
            raise ValueError(f"unknown IMDCT method {method!r}")
        self.method = method
        win = _resolve_window(window, self.win_length)
        self.window = win
        # Fold window and 4/N scaling into the synthesis kernel (N/2, win).
        m = _mdct_matrix_f64(n_fft)[: self.win_length]  # (win, N/2)
        w = np.ones(self.win_length) if win is None else np.asarray(win, np.float64)
        self.kernel = jnp.asarray(
            (4.0 / n_fft) * (m * w[:, None]).T, dtype=dtype
        )
        if method == "fft":
            k = np.arange(1, n_fft, 2, dtype=np.float64)
            n = np.arange(0, 2 * n_fft, 2, dtype=np.float64)
            self._pre = jnp.asarray(
                np.exp(-1j * (np.pi / (2 * n_fft) + np.pi / 4) * k), jnp.complex64
            )
            self._post = jnp.asarray(
                np.exp(-1j * np.pi / (2 * n_fft) * n), jnp.complex64
            )
            wp = np.zeros(n_fft)
            wp[: self.win_length] = w
            self._win_padded = jnp.asarray((4.0 / n_fft) * wp, dtype)

    def __call__(self, spectrum: Array) -> Array:
        if self.method == "fft":
            # reference IMDCT4.forward math (models/mdct.py:457-489)
            x = jnp.fft.fft(self._pre * spectrum, n=self.n_fft, axis=-1)
            frames = jnp.real(x * self._post) * self._win_padded
            frames = frames[..., : self.win_length]
        else:
            frames = jnp.matmul(spectrum, self.kernel, precision=self.precision)
        out = overlap_add(frames, self.hop_length, self.center)
        if self.out_length is not None:
            out = out[..., : self.out_length]
        return out


def mdct(
    signal: Array,
    n_fft: int = 512,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Union[np.ndarray, str, None] = "kbd",
    center: bool = True,
) -> Array:
    return MDCT(n_fft, hop_length, win_length, window, center)(signal)


def imdct(
    spectrum: Array,
    n_fft: int = 512,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Union[np.ndarray, str, None] = "kbd",
    center: bool = True,
    out_length: Optional[int] = None,
) -> Array:
    return IMDCT(n_fft, hop_length, win_length, window, center, out_length)(spectrum)
