"""Fused MDCT spectrogram Pallas kernel.

The unfused path (ops/mdct.py + ops/features.py) materializes the overlapped
frame tensor in HBM — 2x the signal bytes written and read back — then runs
the window+DCT matmul, then a separate elementwise normalize.  This kernel
fuses all three for the hot geometry (hop = win/2):

    HBM signal chunks -> VMEM -> band-split MXU matmuls against the windowed
    cosine kernel (frame f = chunks[f] ++ chunks[f+1], so
    spec = chunks[0:F] @ M_top + chunks[1:F+1] @ M_bot, the shifted band
    realized with pltpu.roll to keep layouts aligned) ->
    arcsinh(gain*x)/ln10 -> affine to norm_range -> HBM spectrum

Grid: (batch,) — one program per sample, full chunk rows resident in VMEM
(129 x 256 fp32 = 132 KB for the flagship geometry; far under the ~16 MB
VMEM budget).  Replaces the reference's MDCT4 (pre-twiddle/FFT/post-twiddle
on cuFFT, models/mdct.py:392-425) + normalize (pix2pixHD_model.py:96-125)
pipeline.  Used by bench.py and available through
``SpectralTransform``-compatible call sites; the XLA matmul path remains the
portable fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdctgan_tpu.ops.mdct import mdct_matrix
from mdctgan_tpu.ops.window import kbd_window

Array = jax.Array
_LN10 = float(np.log(10.0))


def _kernel(chunks_ref, mat_ref, out_ref, *, ratio: int, n_frames: int,
            hop_length: int, gain: float, scale: float, shift: float):
    # chunks_ref: (1, n_rows, hop); frame f = concat of chunk rows
    # [f, f+ratio).  Rather than concatenating sublane-shifted slices (which
    # Mosaic cannot relayout), split the matmul over the kernel's row bands:
    #   spec = sum_i  rows[i : i+n_frames] @ mat[i*hop : (i+1)*hop]
    # realizing each shifted band with pltpu.roll (full-block circular shift
    # keeps layouts aligned; n_rows > n_frames so rolled-in garbage rows
    # never land inside [0, n_frames)).
    rows = chunks_ref[0]
    n_rows = rows.shape[0]
    spec = None
    for i in range(ratio):
        band = rows if i == 0 else pltpu.roll(rows, shift=n_rows - i, axis=0)
        # HIGHEST precision: the MXU's default bf16 passes lose ~1e-1 absolute
        # on O(10) spectral coefficients; the transform must match the f32
        # matmul path (ops/mdct.py uses Precision.HIGHEST too).
        part = jnp.dot(
            band[:n_frames, :],
            mat_ref[i * hop_length : (i + 1) * hop_length, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        spec = part if spec is None else spec + part
    if gain != 0.0:
        # asinh isn't lowered by Mosaic; use the sign-stable closed form
        # asinh(x) = sign(x) * log(|x| + sqrt(x^2 + 1)).
        gx = gain * spec
        y = jnp.abs(gx)
        asinh = jnp.sign(gx) * jnp.log(y + jnp.sqrt(y * y + 1.0))
        spec = asinh * (1.0 / _LN10)
    out_ref[0, :, :] = spec * scale + shift


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "win_length", "gain", "scale", "shift", "interpret",
    ),
)
def mdct_spectro_fused(
    signal: Array,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    gain: float = 0.0,
    scale: float = 1.0,
    shift: float = 0.0,
    interpret: bool = False,
) -> Array:
    """(B, T) -> (B, F, n_fft//2) center-padded MDCT spectrogram with fused
    arcsinh+affine normalization (``gain=0`` disables the arcsinh)."""
    if win_length != n_fft or hop_length * 2 != win_length:
        raise NotImplementedError("fused kernel requires hop = win/2 = n_fft/2")
    ratio = win_length // hop_length  # == 2
    b, t = signal.shape
    # center=True framing layout (ops.mdct.frame_signal): pad hop both ends
    # plus end padding to a hop multiple.
    start_pad = hop_length
    end_pad = start_pad + (-t) % hop_length
    signal = jnp.pad(signal, ((0, 0), (start_pad, end_pad)))
    n_chunks = signal.shape[-1] // hop_length
    n_frames = n_chunks - ratio + 1
    # Pad chunk rows to an fp32 sublane multiple (Mosaic block constraint).
    n_rows = -(-n_chunks // 8) * 8
    if n_rows > n_chunks:
        signal = jnp.pad(signal, ((0, 0), (0, (n_rows - n_chunks) * hop_length)))
    chunks = signal.reshape(b, n_rows, hop_length)

    window = kbd_window(win_length)
    mat = jnp.asarray(mdct_matrix(n_fft, window), jnp.float32)

    # Output rows padded to a sublane multiple as well; cropped after.
    out_rows = -(-n_frames // 8) * 8

    kern = functools.partial(
        _kernel, ratio=ratio, n_frames=out_rows, hop_length=hop_length,
        gain=float(gain), scale=float(scale), shift=float(shift),
    )
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n_rows, hop_length),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (win_length, n_fft // 2),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows, n_fft // 2),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_rows, n_fft // 2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * out_rows * win_length * (n_fft // 2),
            bytes_accessed=(
                b * n_rows * hop_length * 4
                + win_length * (n_fft // 2) * 4
                + b * out_rows * (n_fft // 2) * 4
            ),
            transcendentals=b * out_rows * (n_fft // 2) if gain else 0,
        ),
        interpret=interpret,
    )(chunks, mat)
    return out[:, :n_frames]


def _ikernel(spec_ref, mat_ref, out_ref, *, hop_length: int, gain: float,
             scale: float, shift: float):
    # spec_ref: (1, n_rows, K) normalized spectra; denormalize (affine +
    # sinh) -> synthesis matmul -> cropped overlap-add, all in VMEM.
    # out[c] = frames[c, hop:] + frames[c+1, :hop]  (ops/mdct.py overlap_add
    # for the hop = win/2, center=True geometry); the c+1 row shift is a
    # full-block pltpu.roll like the forward kernel's band trick — rolled-in
    # garbage only lands in rows >= n_frames-1, cropped by the caller.
    y = spec_ref[0]
    x = y * scale + shift
    if gain != 0.0:
        # sinh(x*ln10)/gain via exp (Mosaic has no sinh/asinh lowering).
        e = jnp.exp(x * _LN10)
        x = (e - 1.0 / e) * (0.5 / gain)
    frames = jnp.dot(
        x,
        mat_ref[...],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_rows = frames.shape[0]
    nxt = pltpu.roll(frames, shift=n_rows - 1, axis=0)
    out_ref[0, :, :] = frames[:, hop_length:] + nxt[:, :hop_length]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "win_length", "gain", "scale", "shift", "interpret",
    ),
)
def imdct_audio_fused(
    spectrum: Array,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    gain: float = 0.0,
    scale: float = 1.0,
    shift: float = 0.0,
    interpret: bool = False,
) -> Array:
    """(B, F, n_fft//2) normalized spectra -> (B, (F-1)*hop) waveform.

    The inverse of :func:`mdct_spectro_fused`: fuses the denormalization
    (affine from norm_range back to src_range, then sinh(x*ln10)/gain when
    ``gain != 0``), the synthesis matmul against the windowed (N/2, win)
    IMDCT kernel (4/N and window folded in, as ops/mdct.py IMDCT), and the
    center-cropped overlap-add — replacing the reference's denormalize
    (pix2pixHD_model.py:127-137) + IMDCT4 (models/mdct.py:457-489) pipeline.
    """
    if win_length != n_fft or hop_length * 2 != win_length:
        raise NotImplementedError("fused kernel requires hop = win/2 = n_fft/2")
    b, f, k = spectrum.shape
    if k != n_fft // 2:
        raise ValueError(f"expected {n_fft // 2} bins, got {k}")
    n_rows = -(-f // 8) * 8
    if n_rows > f:
        spectrum = jnp.pad(spectrum, ((0, 0), (0, n_rows - f), (0, 0)))

    window = kbd_window(win_length)
    m = mdct_matrix(n_fft, window).astype(np.float64)  # (win, N/2) windowed
    mat = jnp.asarray((4.0 / n_fft) * m.T, jnp.float32)  # (N/2, win)

    kern = functools.partial(
        _ikernel, hop_length=hop_length,
        gain=float(gain), scale=float(scale), shift=float(shift),
    )
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n_rows, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, win_length), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_rows, hop_length), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_rows, hop_length), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_rows * k * win_length,
            bytes_accessed=(
                b * n_rows * k * 4
                + k * win_length * 4
                + b * n_rows * hop_length * 4
            ),
            transcendentals=b * n_rows * k if gain else 0,
        ),
        interpret=interpret,
    )(spectrum, mat)
    return out[:, : f - 1].reshape(b, (f - 1) * hop_length)


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
