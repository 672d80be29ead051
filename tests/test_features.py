"""Feature-pipeline tests: normalize/denormalize inverses, masking geometry,
and full waveform->spectro->waveform reconstruction in each normalization mode
(reference behavior: models/pix2pixHD_model.py:32-200)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.ops.features import SpectralConfig, SpectralTransform


def make_audio(rng, b=2, t=32512):
    # speech-ish scale: reference waveforms are in [-1, 1]
    return jnp.asarray(0.1 * rng.standard_normal((b, t)), jnp.float32)


def test_arcsinh_normalize_denormalize_inverse(rng):
    tf = SpectralTransform(SpectralConfig())
    x = jnp.asarray(0.01 * rng.standard_normal((2, 1, 8, 16)), jnp.float32)
    y, p = tf.normalize(x)
    back = tf.denormalize(y, p["min"], p["max"])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6, rtol=1e-4)


def test_arcsinh_roundtrip_waveform(rng):
    cfg = SpectralConfig()
    tf = SpectralTransform(cfg)
    audio = make_audio(rng)
    spec, pha, p = tf.to_spectro(audio)
    assert spec.shape == (2, 1, 128, 256)
    out = tf.to_audio(spec, p, pha, out_length=32512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(audio), atol=2e-4)


def test_per_sample_norm_range(rng):
    cfg = SpectralConfig(abs_norm=False, norm_range=(0.0, 1.0))
    tf = SpectralTransform(cfg)
    spec, _, p = tf.to_spectro(make_audio(rng))
    s = np.asarray(spec)
    assert abs(s.min() - 0.0) < 1e-5 and abs(s.max() - 1.0) < 1e-5
    out = tf.to_audio(spec, p, None, out_length=32512)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_zero_fill_fit_residual(rng):
    cfg = SpectralConfig(mask=True, fit_residual=True)
    tf = SpectralTransform(cfg)
    spec, _, _ = tf.lr_forward(make_audio(rng))
    ms = cfg.lr_mask_size
    assert ms == int(256 * (1 - 1 / 3.0))
    s = np.asarray(spec)
    assert np.all(s[..., -ms:] == 0.0)
    assert not np.all(s[..., :-ms] == 0.0)


def test_mask_noise_fill(rng):
    cfg = SpectralConfig(mask=True, fit_residual=False)
    tf = SpectralTransform(cfg)
    spec, _, _ = tf.to_spectro(
        make_audio(rng), mask=True, rng=jax.random.PRNGKey(0)
    )
    s = np.asarray(spec)[..., -cfg.lr_mask_size :]
    assert s.std() > 0  # noise-filled
    assert abs(s.mean()) < 0.1  # roughly centered


def test_explicit_encoding_roundtrip(rng):
    cfg = SpectralConfig(
        arcsinh_transform=False, explicit_encoding=True, abs_spectro=False,
        abs_norm=False, norm_range=(0.0, 1.0),
    )
    tf = SpectralTransform(cfg)
    audio = make_audio(rng)
    spec, pha, p = tf.to_spectro(audio)
    assert spec.shape[1] == 2  # dual channel
    out = tf.to_audio(spec, p, pha, out_length=32512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(audio), atol=5e-3)


def test_g_input_abs_channel(rng):
    cfg = SpectralConfig()
    tf = SpectralTransform(cfg)
    spec, _, _ = tf.to_spectro(make_audio(rng))
    gi = tf.g_input(spec)
    assert gi.shape[1] == 2
    np.testing.assert_allclose(
        np.asarray(gi[:, 1]), np.abs(np.asarray(spec[:, 0])) * 2 - 1.0, atol=1e-6
    )


def test_hr_mask_size_formula():
    cfg = SpectralConfig(sr_sampling_rate=24000)
    assert cfg.hr_mask_size == int(512 * (1 - 24000 / 48000) // 2)
    assert SpectralConfig().hr_mask_size == 0


def test_jit_to_spectro(rng):
    tf = SpectralTransform(SpectralConfig())
    f = jax.jit(lambda a: tf.to_spectro(a)[0])
    out = f(make_audio(rng))
    assert out.shape == (2, 1, 128, 256)


# --------------------------------------------------------------------------
# Fused Pallas to_spectro path (ops/pallas_mdct.py wired into the transform)
# --------------------------------------------------------------------------

def test_fused_to_spectro_matches_unfused(rng):
    cfg = SpectralConfig()
    ref = SpectralTransform(cfg, use_fused=False)
    fused = SpectralTransform(cfg, use_fused=True, fused_interpret=True)
    audio = make_audio(rng)
    spec_ref, pha_ref, p_ref = ref.to_spectro(audio)
    spec_f, pha_f, p_f = fused.to_spectro(audio)
    np.testing.assert_allclose(np.asarray(spec_f), np.asarray(spec_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_f["min"]), np.asarray(p_ref["min"]))
    np.testing.assert_allclose(np.asarray(p_f["max"]), np.asarray(p_ref["max"]))
    # pha is sign-recovered from the fused affine output; compare away from 0
    # where fp cancellation could flip it (decorative on the arcsinh path).
    raw = np.asarray(ref.mdct(audio)[:, None])
    big = np.abs(raw) > 1e-5
    np.testing.assert_array_equal(np.asarray(pha_f)[big], np.asarray(pha_ref)[big])


def test_fused_lr_forward_masked_matches(rng):
    cfg = SpectralConfig(mask=True, fit_residual=True)
    ref = SpectralTransform(cfg, use_fused=False)
    fused = SpectralTransform(cfg, use_fused=True, fused_interpret=True)
    audio = make_audio(rng)
    spec_ref, _, _ = ref.lr_forward(audio)
    spec_f, _, _ = fused.lr_forward(audio)
    assert cfg.lr_mask_size > 0
    assert np.all(np.asarray(spec_f)[..., -cfg.lr_mask_size:] == 0)
    np.testing.assert_allclose(np.asarray(spec_f), np.asarray(spec_ref),
                               atol=1e-4)


def test_fused_roundtrip_to_audio(rng):
    cfg = SpectralConfig()
    fused = SpectralTransform(cfg, use_fused=True, fused_interpret=True)
    audio = make_audio(rng)
    spec, pha, p = fused.to_spectro(audio)
    out = fused.to_audio(spec, p, pha, out_length=32512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(audio), atol=1e-4)


def test_fused_auto_detection_off_on_cpu():
    # Auto mode must not pick the pallas path on the CPU test mesh.
    assert SpectralTransform(SpectralConfig()).use_fused is False


def test_fused_rejects_incompatible_config():
    import pytest
    with pytest.raises(ValueError):
        SpectralTransform(
            SpectralConfig(arcsinh_transform=False), use_fused=True
        )


def test_fused_shard_mapped_over_mesh(rng):
    """Fused kernels dispatched per-shard via shard_map on a CPU mesh match
    the unfused XLA path (and ragged batches fall back cleanly)."""
    from mdctgan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    cfg = SpectralConfig()
    ref = SpectralTransform(cfg, use_fused=False)
    fused = SpectralTransform(cfg, use_fused=True, fused_interpret=True,
                              mesh=mesh)
    audio = jnp.asarray(0.1 * rng.standard_normal((8, 32512)), jnp.float32)
    spec_ref, _, p_ref = ref.to_spectro(audio)
    spec_f, _, p_f = jax.jit(lambda a: fused.to_spectro(a))(audio)
    np.testing.assert_allclose(np.asarray(spec_f), np.asarray(spec_ref),
                               atol=1e-4)
    out_ref = ref.to_audio(spec_ref, p_ref, None, out_length=32512)
    out_f = fused.to_audio(spec_f, p_f, None, out_length=32512)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=1e-4)
    # ragged batch (3 % 4 != 0) falls back to the unsharded call
    ragged = audio[:3]
    s_r, _, _ = fused.to_spectro(ragged)
    s_rr, _, _ = ref.to_spectro(ragged)
    np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_rr), atol=1e-4)


def test_display_spectra_denormalizes_and_clips():
    """Display parity (pix2pixHD_model.py:568-613): visuals are shown
    denormalized through the norm params; SR uses the LR params then clips
    to the HR min/max; explicit_encoding averages the two channels."""
    import numpy as np

    from mdctgan_tpu.ops.features import SpectralConfig
    from mdctgan_tpu.utils.spectro_img import display_spectra

    cfg = SpectralConfig(norm_range=(-1.0, 1.0))
    rng = np.random.default_rng(0)
    lr = rng.uniform(-1, 1, (2, 1, 4, 6)).astype(np.float32)
    sr = rng.uniform(-1.5, 1.5, (2, 1, 4, 6)).astype(np.float32)  # overshoots
    hr = rng.uniform(-1, 1, (2, 1, 4, 6)).astype(np.float32)
    lr_np = {"min": np.float32(-5.0), "max": np.float32(5.0)}
    hr_np = {"min": np.float32(-4.0), "max": np.float32(4.0)}
    out = display_spectra(cfg, lr, sr, hr, lr_np, hr_np)

    def den(x, lo, hi):
        return (x + 1.0) / 2.0 * (hi - lo) + lo

    np.testing.assert_allclose(out["lr_spectro"], den(lr[0, 0], -5, 5),
                               rtol=1e-6)
    np.testing.assert_allclose(out["hr_spectro"], den(hr[0, 0], -4, 4),
                               rtol=1e-6)
    expect_sr = np.clip(den(sr[0, 0], -5, 5), -4.0, 4.0)  # LR params, HR clip
    np.testing.assert_allclose(out["sr_spectro"], expect_sr, rtol=1e-6)
    assert out["sr_spectro"].max() <= 4.0 + 1e-6

    cfg_ex = SpectralConfig(arcsinh_transform=False, explicit_encoding=True)
    lr2 = rng.uniform(-1, 1, (1, 2, 4, 6)).astype(np.float32)
    out2 = display_spectra(cfg_ex, lr2, lr2, lr2, lr_np, hr_np)
    np.testing.assert_allclose(out2["lr_spectro"],
                               0.5 * (lr2[0, 0] + lr2[0, 1]), rtol=1e-6)
