"""End-to-end inference parity vs a stock-torch + float64 oracle.

Composes the full reference inference chain (pix2pixHD_model.py:618-638):
MDCT -> arcsinh normalize -> abs channel -> netG -> fit_residual LR-band
x1e-3 quirk (:631-635) -> denormalize with the *LR* norm params (:636) ->
IMDCT, entirely from independent oracles (the float64 MDCT/IMDCT
transcriptions in test_mdct.py, a NumPy normalize oracle, and the
stock-torch generator skeletons from test_import_gold.py), and asserts the
jitted ``build_inference_fn`` waveform output matches on imported weights.

Every stage is unit-tested elsewhere; this test pins the *composition* —
band edges, layout transposes, and which norm params feed the denorm.
"""

import numpy as np
import jax.numpy as jnp
import torch

from test_import_gold import _flax_local, _randomize, _torch_local
from test_mdct import reference_imdct4, reference_mdct4

from mdctgan_tpu.ops.features import SpectralConfig, SpectralTransform
from mdctgan_tpu.ops.window import kbd_window
from mdctgan_tpu.train import import_torch
from mdctgan_tpu.train.step import build_inference_fn

# Small geometry: n_fft=128 -> 64 freq bins; segment 4032 -> 64 frames.
# 16->48 kHz keeps the flagship up_ratio (3) so lr_part = int(64/3) = 21
# exercises the truncated-band edge.
GEN_CFG = dict(
    input_nc=2, output_nc=1, ngf=4, n_downsample_global=2, n_blocks_global=2,
    n_blocks_local=2, n_attn_g=1, n_attn_l=0, input_size=(64, 64),
    proj_factor_g=4, heads_g=2, dim_head_g=4,
    proj_factor_l=2, heads_l=2, dim_head_l=4,
    downsample_type="resconv", upsample_type="interpolate",
)


def _spectral_cfg(**over):
    base = dict(
        n_fft=128, hop_length=64, win_length=128, center=True,
        segment_length=4032, lr_sampling_rate=16000, hr_sampling_rate=48000,
        arcsinh_transform=True, abs_norm=True, abs_spectro=True,
        fit_residual=True, mask=False,
    )
    base.update(over)
    return SpectralConfig(**base)


def _oracle_infer(torch_model, lr_audio, cfg):
    """Float64/torch replica of the reference inference chain."""
    w = np.asarray(kbd_window(cfg.n_fft), np.float64)
    spec = reference_mdct4(
        lr_audio.astype(np.float64), cfg.n_fft, cfg.hop_length, w,
        center=cfg.center,
    )[:, None]  # (B, 1, F, K) NCHW image
    # arcsinh normalize + abs_norm affine (pix2pixHD_model.py:96-125)
    lo, hi = cfg.src_range
    n0, n1 = cfg.norm_range
    y = np.arcsinh(cfg.arcsinh_gain * spec) / np.log(10.0)
    lr_spec = (y - lo) / (hi - lo) * (n1 - n0) + n0
    # abs input channel (pix2pixHD_model.py:400-404)
    g_in = np.concatenate((lr_spec, np.abs(lr_spec) * 2 + n0), axis=1)
    with torch.no_grad():
        sr = torch_model(torch.from_numpy(g_in.astype(np.float32)))
    sr = sr.numpy().astype(np.float64)
    # fit_residual recombination quirk (pix2pixHD_model.py:631-635)
    lr_part = int(sr.shape[-1] / cfg.up_ratio)
    sr[..., :lr_part] *= 1e-3
    sr = sr + lr_spec
    # denormalize with the LR (static abs_norm) params (:636), then IMDCT
    x = (sr - n0) / (n1 - n0) * (hi - lo) + lo
    spec_out = np.sinh(x * np.log(10.0)) / cfg.arcsinh_gain
    audio = reference_imdct4(
        spec_out[:, 0], cfg.n_fft, cfg.hop_length, w, center=cfg.center
    )[..., : cfg.segment_length]
    return sr, audio


def _run_both(rng, cfg):
    torch_model = _torch_local(GEN_CFG)
    _randomize(torch_model, rng)
    torch_model.eval()
    flax_model = _flax_local(GEN_CFG)
    params, stats = import_torch.import_generator(
        torch_model.state_dict(), flax_model)
    g_vars = {"params": params, "batch_stats": stats}

    lr_audio = (0.1 * rng.standard_normal((2, cfg.segment_length))).astype(
        np.float32)
    ref_sr, ref_audio = _oracle_infer(torch_model, lr_audio, cfg)

    transform = SpectralTransform(cfg)
    infer = build_inference_fn(
        flax_model, transform, out_length=cfg.segment_length)
    sr, sr_audio = infer(g_vars, jnp.asarray(lr_audio))
    return ref_sr, ref_audio, np.asarray(sr), np.asarray(sr_audio)


def test_e2e_inference_flagship_constants(rng):
    """Flagship normalization constants (gain 1000, src [-5,5]).  The
    normalized-domain output must match tightly; the waveform tolerance
    reflects denorm amplification (d/dy sinh(y ln10)/1000 * 2.5 at |y|=5 is
    ~575x), so it is asserted relative to the oracle's own scale."""
    cfg = _spectral_cfg(arcsinh_gain=1000.0, src_range=(-5.0, 5.0),
                        norm_range=(-1.0, 1.0))
    ref_sr, ref_audio, sr, sr_audio = _run_both(rng, cfg)
    assert sr.shape == ref_sr.shape and sr_audio.shape == ref_audio.shape
    np.testing.assert_allclose(sr, ref_sr, atol=5e-4)
    scale = np.abs(ref_audio).max()
    np.testing.assert_allclose(sr_audio, ref_audio, atol=2e-3 * scale)


def test_e2e_inference_gentle_constants(rng):
    """Gentle constants (gain 10, src [-2,2]) keep the denorm slope ~O(10),
    so the waveform itself is asserted at near-fp32 tightness."""
    cfg = _spectral_cfg(arcsinh_gain=10.0, src_range=(-2.0, 2.0),
                        norm_range=(-1.0, 1.0))
    ref_sr, ref_audio, sr, sr_audio = _run_both(rng, cfg)
    np.testing.assert_allclose(sr, ref_sr, atol=5e-4)
    np.testing.assert_allclose(sr_audio, ref_audio, atol=2e-2)


# ---------------------------------------------------------------------- #
# non-arcsinh (dB) path: per-sample norm params, sign reattach, and the
# reference's pseudo-phase-along-FRAMES quirk (pix2pixHD_model.py:150-157
# splits dim=-2 while the mask splits dim=3)
# ---------------------------------------------------------------------- #

DB_GEN_CFG = dict(GEN_CFG, input_nc=1)  # no abs channel without arcsinh


def _oracle_infer_db(torch_model, lr_audio, cfg):
    """Float64/torch replica of the dB-path inference chain
    (pix2pixHD_model.py:102-106 normalize, :139-163 to_audio)."""
    w = np.asarray(kbd_window(cfg.n_fft), np.float64)
    spec = reference_mdct4(
        lr_audio.astype(np.float64), cfg.n_fft, cfg.hop_length, w,
        center=cfg.center,
    )[:, None]
    pha = np.sign(spec)
    n0, n1 = cfg.norm_range
    y = 20.0 * np.log10(np.maximum(np.abs(spec) + cfg.min_value,
                                   cfg.min_value)) - 20.0
    hi = y.max(axis=(-2, -1), keepdims=True)
    lo = y.min(axis=(-2, -1), keepdims=True)
    lr_spec = (y - lo) / (hi - lo) * (n1 - n0) + n0
    with torch.no_grad():
        sr = torch_model(torch.from_numpy(lr_spec.astype(np.float32)))
    sr = sr.numpy().astype(np.float64)
    lr_part = int(sr.shape[-1] / cfg.up_ratio)
    sr[..., :lr_part] *= 1e-3
    sr = sr + lr_spec
    x = (sr - n0) / (n1 - n0) * (hi - lo) + lo
    mag = 10.0 * np.power(10.0, x * 0.5 / 10.0) - cfg.min_value
    # sign reattach + constant +1 pseudo phase (rng=None) split along dim=-2
    lr_rows = int(pha.shape[-2] * (1 / cfg.up_ratio))
    pha_full = np.concatenate(
        (pha[..., :lr_rows, :], np.ones_like(pha)[..., lr_rows:, :]), axis=-2)
    spec_out = mag * pha_full
    audio = reference_imdct4(
        spec_out[:, 0], cfg.n_fft, cfg.hop_length, w, center=cfg.center
    )[..., : cfg.segment_length]
    return sr, audio


def _oracle_infer_explicit(torch_model, lr_audio, cfg):
    """Float64/torch replica of the explicit_encoding (dual-channel +/-dB)
    chain (pix2pixHD_model.py:84-95 normalize, :143-145 decode)."""
    w = np.asarray(kbd_window(cfg.n_fft), np.float64)
    spec = reference_mdct4(
        lr_audio.astype(np.float64), cfg.n_fft, cfg.hop_length, w,
        center=cfg.center,
    )[:, None]
    neg = 0.5 * (np.abs(spec) - spec)
    pos = spec + neg
    a = cfg.alpha

    def db(x):
        return 20.0 * np.log10(np.maximum(x, cfg.min_value)) - 20.0

    y = np.concatenate(
        (db(a * pos + (1 - a) * neg), db((1 - a) * pos + a * neg)), axis=1)
    n0, n1 = cfg.norm_range
    hi = y.max(axis=(-2, -1), keepdims=True)
    lo = y.min(axis=(-2, -1), keepdims=True)
    lr_spec = (y - lo) / (hi - lo) * (n1 - n0) + n0
    with torch.no_grad():
        sr = torch_model(torch.from_numpy(lr_spec.astype(np.float32)))
    sr = sr.numpy().astype(np.float64)
    lr_part = int(sr.shape[-1] / cfg.up_ratio)
    sr[..., :lr_part] *= 1e-3
    sr = sr + lr_spec
    x = (sr - n0) / (n1 - n0) * (hi - lo) + lo
    mag = 10.0 * np.power(10.0, x * 0.5 / 10.0) - cfg.min_value
    spec_out = (mag[:, 0] - mag[:, 1]) / (2 * a - 1)
    audio = reference_imdct4(
        spec_out, cfg.n_fft, cfg.hop_length, w, center=cfg.center
    )[..., : cfg.segment_length]
    return sr, audio


def test_e2e_inference_explicit_encoding(rng):
    cfg = _spectral_cfg(arcsinh_transform=False, explicit_encoding=True,
                        abs_spectro=False, abs_norm=False,
                        norm_range=(0.0, 1.0))
    gen_cfg = dict(GEN_CFG, input_nc=2, output_nc=2)
    torch_model = _torch_local(gen_cfg)
    _randomize(torch_model, rng)
    torch_model.eval()
    flax_model = _flax_local(gen_cfg)
    params, stats = import_torch.import_generator(
        torch_model.state_dict(), flax_model)
    g_vars = {"params": params, "batch_stats": stats}

    lr_audio = (0.1 * rng.standard_normal((2, cfg.segment_length))).astype(
        np.float32)
    ref_sr, ref_audio = _oracle_infer_explicit(torch_model, lr_audio, cfg)

    transform = SpectralTransform(cfg)
    infer = build_inference_fn(
        flax_model, transform, out_length=cfg.segment_length)
    sr, sr_audio = infer(g_vars, jnp.asarray(lr_audio))
    np.testing.assert_allclose(np.asarray(sr), ref_sr, atol=1e-3)
    scale = np.abs(ref_audio).max()
    np.testing.assert_allclose(
        np.asarray(sr_audio), ref_audio, atol=1e-2 * scale)


def test_e2e_inference_raw_mdct(rng):
    """Fourth (raw) normalization mode: identity transform + per-sample
    affine, no sign handling (pix2pixHD_model.py:102-106 raw branch,
    :147-148 pass-through decode).  Completes e2e oracle coverage of every
    reference inference mode."""
    cfg = _spectral_cfg(arcsinh_transform=False, raw_mdct=True,
                        abs_norm=False, norm_range=(-1.0, 1.0))
    torch_model = _torch_local(DB_GEN_CFG)  # 1-channel input, like dB
    _randomize(torch_model, rng)
    torch_model.eval()
    flax_model = _flax_local(DB_GEN_CFG)
    params, stats = import_torch.import_generator(
        torch_model.state_dict(), flax_model)
    g_vars = {"params": params, "batch_stats": stats}

    lr_audio = (0.1 * rng.standard_normal((2, cfg.segment_length))).astype(
        np.float32)
    # oracle: MDCT -> per-sample affine -> G -> fit_residual -> inverse
    # affine -> IMDCT (raw mode is the identity transform)
    w = np.asarray(kbd_window(cfg.n_fft), np.float64)
    spec = reference_mdct4(lr_audio.astype(np.float64), cfg.n_fft,
                           cfg.hop_length, w, center=cfg.center)[:, None]
    n0, n1 = cfg.norm_range
    hi = spec.max(axis=(-2, -1), keepdims=True)
    lo = spec.min(axis=(-2, -1), keepdims=True)
    lr_spec = (spec - lo) / (hi - lo) * (n1 - n0) + n0
    with torch.no_grad():
        sr = torch_model(torch.from_numpy(lr_spec.astype(np.float32)))
    sr = sr.numpy().astype(np.float64)
    lr_part = int(sr.shape[-1] / cfg.up_ratio)
    sr[..., :lr_part] *= 1e-3
    sr = sr + lr_spec
    spec_out = (sr - n0) / (n1 - n0) * (hi - lo) + lo
    ref_audio = reference_imdct4(
        spec_out[:, 0], cfg.n_fft, cfg.hop_length, w, center=cfg.center
    )[..., : cfg.segment_length]

    transform = SpectralTransform(cfg)
    infer = build_inference_fn(
        flax_model, transform, out_length=cfg.segment_length)
    got_sr, got_audio = infer(g_vars, jnp.asarray(lr_audio))
    np.testing.assert_allclose(np.asarray(got_sr), sr, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_audio), ref_audio, atol=1e-3)


def test_e2e_inference_db_path(rng):
    cfg = _spectral_cfg(arcsinh_transform=False, abs_norm=False,
                        norm_range=(0.0, 1.0))
    torch_model = _torch_local(DB_GEN_CFG)
    _randomize(torch_model, rng)
    torch_model.eval()
    flax_model = _flax_local(DB_GEN_CFG)
    params, stats = import_torch.import_generator(
        torch_model.state_dict(), flax_model)
    g_vars = {"params": params, "batch_stats": stats}

    lr_audio = (0.1 * rng.standard_normal((2, cfg.segment_length))).astype(
        np.float32)
    ref_sr, ref_audio = _oracle_infer_db(torch_model, lr_audio, cfg)

    transform = SpectralTransform(cfg)
    infer = build_inference_fn(
        flax_model, transform, out_length=cfg.segment_length)
    sr, sr_audio = infer(g_vars, jnp.asarray(lr_audio))
    np.testing.assert_allclose(np.asarray(sr), ref_sr, atol=1e-3)
    scale = np.abs(ref_audio).max()
    np.testing.assert_allclose(
        np.asarray(sr_audio), ref_audio, atol=1e-2 * scale)
