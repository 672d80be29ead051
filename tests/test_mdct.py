"""DSP-core tests: window correctness, MDCT<->IMDCT round trip, and numerical
parity with the reference algorithm (an independent float64 re-derivation of
the twiddle/FFT pipeline in reference models/mdct.py:359-489 — the reference
itself has no tests, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mdctgan_tpu.ops.mdct import MDCT, IMDCT, frame_signal, overlap_add
from mdctgan_tpu.ops.window import kbd_window


def reference_mdct4(x: np.ndarray, n_fft: int, hop: int, window: np.ndarray,
                    center: bool = True) -> np.ndarray:
    """Float64 NumPy transcription of the *math* of reference MDCT4.forward:
    pad -> overlapped frames -> window -> pre-twiddle exp(-i*pi*n/N) -> FFT ->
    keep N/2 bins -> post-twiddle real part (models/mdct.py:392-425)."""
    t = x.shape[-1]
    start = hop if center else 0
    end = start + (-t) % hop
    x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(start, end)])
    n_frames = (x.shape[-1] - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[..., idx] * window
    n = np.arange(n_fft)
    exp1 = np.exp(-1j * np.pi / n_fft * n)
    k = np.arange(1, n_fft, 2)
    exp2 = np.exp(-1j * (np.pi / (2 * n_fft) + np.pi / 4) * k)
    spec = np.fft.fft(frames * exp1, axis=-1)[..., : n_fft // 2]
    return np.real(exp2 * spec)


def reference_imdct4(spec: np.ndarray, n_fft: int, hop: int, window: np.ndarray,
                     center: bool = True) -> np.ndarray:
    """Float64 transcription of reference IMDCT4.forward (models/mdct.py:457-489)."""
    k = np.arange(1, n_fft, 2)
    exp1 = np.exp(-1j * (np.pi / (2 * n_fft) + np.pi / 4) * k)
    n = np.arange(0, 2 * n_fft, 2)
    exp2 = np.exp(-1j * np.pi / (2 * n_fft) * n)
    x = np.fft.fft(exp1 * spec, n=n_fft, axis=-1)
    frames = np.real(x * exp2) * window
    n_frames = frames.shape[-2]
    out_len = (n_frames - 1) * hop + n_fft
    out = np.zeros((*frames.shape[:-2], out_len))
    for i in range(n_frames):
        out[..., i * hop : i * hop + n_fft] += frames[..., i, :]
    out *= 4 / n_fft
    if center:
        out = out[..., n_fft // 2 : -(n_fft // 2)]
    return out


def test_kbd_window_princen_bradley():
    for n in (64, 512):
        w = kbd_window(n)
        assert w.shape == (n,)
        np.testing.assert_allclose(w, w[::-1], atol=1e-12)  # symmetric
        pb = w[: n // 2] ** 2 + w[n // 2 :] ** 2
        np.testing.assert_allclose(pb, np.ones(n // 2), atol=1e-12)


def test_frame_signal_matches_unfold(rng):
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    f = np.asarray(frame_signal(jnp.asarray(x), 64, 32, center=True))
    start, t = 32, 1000
    end = start + (-t) % 32
    xp = np.pad(x, [(0, 0), (start, end)])
    n_frames = (xp.shape[-1] - 64) // 32 + 1
    idx = np.arange(n_frames)[:, None] * 32 + np.arange(64)[None, :]
    np.testing.assert_allclose(f, xp[:, idx], atol=0)


def test_mdct_matches_reference_algorithm(rng):
    n_fft, hop = 512, 256
    w = kbd_window(n_fft)
    x = rng.standard_normal((3, 4096))
    ref = reference_mdct4(x, n_fft, hop, w)
    got = np.asarray(MDCT(n_fft)(jnp.asarray(x, jnp.float32)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_imdct_matches_reference_algorithm(rng):
    n_fft, hop = 512, 256
    w = kbd_window(n_fft)
    spec = rng.standard_normal((2, 16, n_fft // 2))
    ref = reference_imdct4(spec, n_fft, hop, w)
    got = np.asarray(IMDCT(n_fft)(jnp.asarray(spec, jnp.float32)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_roundtrip_perfect_reconstruction(rng):
    """KBD + hop=N/2 satisfies Princen-Bradley => IMDCT(MDCT(x)) == x."""
    n_fft = 512
    x = rng.standard_normal((2, 32512)).astype(np.float32)
    spec = MDCT(n_fft)(jnp.asarray(x))
    assert spec.shape == (2, 128, 256)  # BINS=128 for segment_length=32512
    out = np.asarray(IMDCT(n_fft, out_length=32512)(spec))
    assert out.shape == x.shape
    np.testing.assert_allclose(out, x, atol=5e-4)


def test_roundtrip_default_segment_shapes():
    """The training geometry: segment 32512 = (BINS-1)*HOP (audio_config.py)."""
    x = jnp.zeros((1, 32512))
    spec = MDCT(512)(x)
    assert spec.shape == (1, 128, 256)


def test_overlap_add_general_path(rng):
    frames = rng.standard_normal((2, 10, 64)).astype(np.float32)
    fast = overlap_add(jnp.asarray(frames), 32, center=True)
    # brute force
    out = np.zeros((2, 9 * 32 + 64), np.float32)
    for i in range(10):
        out[:, i * 32 : i * 32 + 64] += frames[:, i]
    np.testing.assert_allclose(np.asarray(fast), out[:, 32:-32], atol=1e-5)


@pytest.mark.parametrize("tlen", [32512, 32500, 1000])
def test_uneven_length_padding(rng, tlen):
    x = rng.standard_normal((1, tlen)).astype(np.float32)
    spec = MDCT(512)(jnp.asarray(x))
    w = kbd_window(512)
    ref = reference_mdct4(x, 512, 256, w)
    assert spec.shape == ref.shape
    np.testing.assert_allclose(np.asarray(spec), ref, atol=2e-4, rtol=1e-4)


def test_fft_method_matches_matmul(rng):
    """MDCT(method='fft') == MDCT(method='matmul') — the reference's
    twiddle/FFT factorization (MDCT4/FastMDCT4 analogue) against the MXU
    matmul formulation."""
    x = jnp.asarray(rng.standard_normal((3, 4000)), jnp.float32)
    for n_fft in (64, 512):
        a = MDCT(n_fft, method="matmul")(x)
        b = MDCT(n_fft, method="fft")(x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fft_imdct_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    spec = MDCT(512, method="fft")(x)
    back = IMDCT(512, method="fft", out_length=4096)(spec)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_fft_imdct_matches_matmul(rng):
    spec = jnp.asarray(rng.standard_normal((2, 17, 256)), jnp.float32)
    a = IMDCT(512, method="matmul")(spec)
    b = IMDCT(512, method="fft")(spec)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
