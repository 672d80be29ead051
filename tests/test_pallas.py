"""Fused Pallas MDCT kernel vs the XLA matmul path (interpret mode on CPU;
the same kernel compiles via Mosaic on real TPU — exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mdctgan_tpu.ops.mdct import MDCT
from mdctgan_tpu.ops.pallas_mdct import mdct_spectro_fused

_LN10 = float(np.log(10.0))


@pytest.mark.parametrize("t", [8128, 8000])  # hop-aligned and ragged lengths
def test_fused_matches_unfused(rng, t):
    x = jnp.asarray(rng.standard_normal((3, t)), jnp.float32)
    m = MDCT(512)
    ref = np.arcsinh(1000.0 * np.asarray(m(x))) / _LN10 * 0.5 + 0.25
    got = np.asarray(
        mdct_spectro_fused(x, gain=1000.0, scale=0.5, shift=0.25, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_fused_raw_mode(rng):
    x = jnp.asarray(rng.standard_normal((2, 8128)), jnp.float32)
    m = MDCT(512)
    ref = np.asarray(m(x))
    got = np.asarray(mdct_spectro_fused(x, gain=0.0, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_fused_rejects_bad_geometry(rng):
    x = jnp.asarray(rng.standard_normal((1, 1024)), jnp.float32)
    with pytest.raises(NotImplementedError):
        mdct_spectro_fused(x, n_fft=512, hop_length=128, win_length=512,
                           interpret=True)


# --------------------------------------------------------------------------
# Fused inverse: denormalize(sinh) + IMDCT + overlap-add
# --------------------------------------------------------------------------

def test_fused_imdct_matches_unfused(rng):
    from mdctgan_tpu.ops.mdct import IMDCT
    from mdctgan_tpu.ops.pallas_mdct import imdct_audio_fused

    # y spans the real normalized range [-1, 1] (norm_range); wider inputs
    # make sinh explode past f32 usefulness and aren't reachable in practice.
    y = jnp.asarray(rng.uniform(-1.0, 1.0, (2, 128, 256)), jnp.float32)
    scale, shift = 5.0, 0.0
    spec = np.sinh((np.asarray(y, np.float64) * scale + shift) * _LN10) / 1000.0
    ref = np.asarray(IMDCT(512)(jnp.asarray(spec, jnp.float32)))
    got = np.asarray(
        imdct_audio_fused(y, gain=1000.0, scale=scale, shift=shift, interpret=True)
    )
    assert got.shape == (2, 127 * 256)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_fused_imdct_raw_mode(rng):
    from mdctgan_tpu.ops.mdct import IMDCT
    from mdctgan_tpu.ops.pallas_mdct import imdct_audio_fused

    spec = jnp.asarray(rng.standard_normal((1, 40, 256)), jnp.float32)
    ref = np.asarray(IMDCT(512)(spec))
    got = np.asarray(imdct_audio_fused(spec, gain=0.0, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_forward_inverse_roundtrip(rng):
    from mdctgan_tpu.ops.pallas_mdct import imdct_audio_fused

    x = jnp.asarray(0.1 * rng.standard_normal((2, 32512)), jnp.float32)
    y = mdct_spectro_fused(x, gain=1000.0, scale=0.1, shift=0.0, interpret=True)
    back = imdct_audio_fused(y, gain=1000.0, scale=10.0, shift=0.0, interpret=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
