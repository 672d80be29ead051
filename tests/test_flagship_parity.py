"""Parity at the SHIPPED flagship geometry (reference train.sh:3-17).

Every other parity proof (forward, loss wiring, gradient, Adam trajectory,
waveform oracles) runs at reduced geometry — ngf 4, 64x64 maps, segment 4032
— plus one eval-mode flagship forward at batch 2
(test_import_gold.test_forward_parity_flagship_local).  The flagship config
exercises code paths those shapes never touch:

  * ``PolyphaseConv``'s 4x8 two-D head fold at the real full-resolution
    output (models/layers.py head eligibility check),
  * the dilated-upsample custom VJP at the real 5x5/3x3 sites
    (896->448, 448->224, 224->112, 112->56 channel widths),
  * attention at fmap 8x16 with 6 heads x 128 dims,
  * batch >= 8 (the fused-transform gate's batch regime).

This file certifies the configuration users actually run: ONE torch
reference-schedule SGD step vs ONE fused jitted step on the full flagship
G+D — train-mode forward parity of the SR spectro at batch 8, then G and D
gradient parity (SGD lr=1 makes the parameter delta the gradient), at the
real 128x256 spectro shape with the default ``SpectralConfig`` (n_fft 512,
segment 32512, arcsinh gain 1000, src [-5,5] -> norm [-1,1]).

Single-core CPU cost is dominated by ~2.5 TFLOP of conv work plus the XLA
compile of the fused step; marked slow but kept in the default suite — this
is the parity certificate of record.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402
import optax  # noqa: E402
import torch  # noqa: E402

from test_grad_parity import (  # noqa: E402
    _assert_tree_close_normwise,
    _torch_reference_step,
)
from test_import_gold import (  # noqa: E402
    FLAGSHIP_LOCAL,
    _flax_local,
    _randomize,
    _torch_local,
    build_torch_discriminator,
)

from mdctgan_tpu.models.discriminator import MultiscaleDiscriminator  # noqa: E402
from mdctgan_tpu.ops.features import SpectralConfig, SpectralTransform  # noqa: E402
from mdctgan_tpu.train import import_torch  # noqa: E402
from mdctgan_tpu.train.state import create_train_state  # noqa: E402
from mdctgan_tpu.train.step import build_train_step  # noqa: E402

# train.sh: --num_D 3 (n_layers_D, ndf at base_options defaults 3, 64)
NUM_D, N_LAYERS, NDF, LAMBDA_FEAT = 3, 3, 64, 10.0
BATCH = 8


@pytest.mark.slow
def test_flagship_geometry_forward_and_gradient_parity(rng):
    cfg = SpectralConfig()  # the defaults ARE the flagship transform
    assert (cfg.n_bins, cfg.n_fft // 2) == FLAGSHIP_LOCAL["input_size"]
    transform = SpectralTransform(cfg)

    torch_g = _torch_local(FLAGSHIP_LOCAL)
    _randomize(torch_g, rng)
    torch_g.train()
    flax_g = _flax_local(FLAGSHIP_LOCAL)
    g_params, g_stats = import_torch.import_generator(
        torch_g.state_dict(), flax_g)

    torch_d = build_torch_discriminator(
        input_nc=3, ndf=NDF, n_layers=N_LAYERS, num_D=NUM_D)
    _randomize(torch_d, rng)
    torch_d.train()
    d_params = import_torch.import_discriminator(
        torch_d.state_dict(), NUM_D, N_LAYERS)
    flax_d = MultiscaleDiscriminator(ndf=NDF, n_layers=N_LAYERS, num_D=NUM_D)

    hr = 0.1 * rng.standard_normal((BATCH, cfg.segment_length)).astype(np.float32)
    lr = hr + 0.01 * rng.standard_normal(hr.shape).astype(np.float32)
    lr_spec = np.asarray(transform.lr_forward(jnp.asarray(lr))[0])
    hr_spec = np.asarray(transform.hr_forward(jnp.asarray(hr))[0])

    env = dict(cfg=cfg, torch_g=torch_g, torch_d=torch_d,
               lr_spec=lr_spec, hr_spec=hr_spec)

    # --- torch side: one reference-schedule step, SGD(lr=1) ------------- #
    def _snapshot():
        gp, gs = import_torch.import_generator(torch_g.state_dict(), flax_g)
        dp = import_torch.import_discriminator(
            torch_d.state_dict(), NUM_D, N_LAYERS)
        return gp, gs, dp

    g0, _, d0 = _snapshot()
    ref_sr = _torch_reference_step(
        env,
        torch.optim.SGD(torch_g.parameters(), lr=1.0),
        torch.optim.SGD(torch_d.parameters(), lr=1.0))
    g1, _, d1 = _snapshot()

    # --- flax side: one fused step with the same weights ---------------- #
    sgd = optax.sgd(1.0)
    h, w = FLAGSHIP_LOCAL["input_size"]
    state = create_train_state(
        jax.random.PRNGKey(0), flax_g, flax_d, sgd, sgd,
        spectro_shape=(h, w), g_in_channels=2, d_in_channels=3,
    )
    state = state.replace(g_params=g_params, batch_stats=g_stats,
                          d_params=d_params)
    step = build_train_step(
        flax_g, flax_d, transform, sgd, sgd, num_d=NUM_D,
        n_layers_d=N_LAYERS, lambda_feat=LAMBDA_FEAT, donate=False)
    batch = {"lr_audio": jnp.asarray(lr), "hr_audio": jnp.asarray(hr)}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    # train-mode forward parity at the flagship shape: the fused step's SR
    # spectro (recovered from the fake concat it emits for the pool when
    # use_pool; here recomputed from the updated-stats-free apply) vs torch.
    from mdctgan_tpu.train.step import generator_forward
    sr_flax, _ = generator_forward(
        flax_g, transform, {"params": g_params, "batch_stats": g_stats},
        jnp.asarray(lr_spec), train=True, mutable=True)
    ref_scale = float(np.abs(ref_sr).max())
    np.testing.assert_allclose(
        np.asarray(sr_flax), ref_sr, atol=2e-3 * max(ref_scale, 1.0))

    # Gradient parity, normwise per tensor.  Bounds are set by MEASUREMENT
    # (tools/flagship_grad_truth.py compares BOTH frameworks' f32 gradients
    # against a torch-float64 ground truth at this exact init and data):
    #   * torch's OWN f32 error vs truth: G median 4.1e-3, max 4.7e-3 —
    #     ~40 conv layers at 128x256 are gradient-chaotic at the 1e-3 level.
    #   * our fused step's f32 error vs truth: G median 4.5e-3, max 1.59e-2
    #     (ratio vs torch: median 1.14; worst 3.9x, concentrated in the
    #     deepest attention block — accumulation-order noise amplified with
    #     depth, not a localized defect: err_j32 tracks cross on every
    #     tensor and forward parity at this geometry passes at 2e-3.
    #     PROVEN experimentally, not just inferred: rerunning the probe
    #     with the attention interior in f64 (--attn-f64) collapses the
    #     ratio to median 0.99 / max 1.64 and err_j32 max to 5.8e-3 —
    #     torch's own noise class; a wiring defect would have survived
    #     the precision bump.  docs/PERFORMANCE.md "Flagship gradient
    #     parity bound").
    #   * measured max cross error: G 1.62e-2, D 2.6e-3.
    # G bound 2.5e-2 / D bound 5e-3 = measured max + ~50% headroom.  Wiring
    # errors (leaked/zeroed/misplaced-detach grads) are O(1)-O(10) normwise
    # here, 2-3 orders above these bounds.
    # floor=1e-3: conv biases feeding a train-mode mean-subtracting norm
    # have an EXACTLY-zero true gradient; at this geometry both frameworks
    # hold ~2e-4 of f32 dust there (the probe filters such tensors by their
    # f64-truth norm; this test has no truth side, so it floors them) —
    # still 3-4 orders below any wiring error.
    sub_t = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), g0, g1)
    sub_j = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                         state.g_params, new_state.g_params)
    _assert_tree_close_normwise(sub_t, sub_j, 2.5e-2, "flagship G grad",
                                floor=1e-3)
    sub_td = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), d0, d1)
    sub_jd = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                          state.d_params, new_state.d_params)
    _assert_tree_close_normwise(sub_td, sub_jd, 5e-3, "flagship D grad",
                                floor=1e-3)

    for k in ("loss_G", "loss_D"):
        assert np.isfinite(float(metrics[k]))


@pytest.mark.slow
def test_flagship_inference_waveform_parity(rng):
    """The SERVING chain at the shipped geometry (VERDICT r4 #3): waveform →
    waveform vs the float64+stock-torch oracle at ngf 56 / 128×256 / batch 8,
    covering the fit_residual 1e-3 LR-band rescale, the LR-params
    denormalize (f32 here vs the reference's deliberate float64,
    pix2pixHD_model.py:128-137,631-636), the IMDCT+OLA, and the
    flagship-shape segment unfold + whole-file stitch.

    Rows 0..k-1 are the unfolded segments of one long clip (stitched and
    compared whole-file at the end); the remaining rows are independent
    segments — all served in ONE batch-8 inference call, the batch-serving
    unit generate_cli dispatches.

    Bounds are MEASURED (tools/flagship_infer_truth.py prints the live
    errors; CPU f32 — the numerics this suite runs under): normalized-domain
    max |Δsr| measured 3.88e-4, waveform max measured 3.7e-5 of the oracle's
    own scale, stitched whole file the same 3.7e-5 relative.  Asserted at
    ~3× (sr) and ~50× (waveform — the denorm slope d/dy sinh(y·ln10)/1000
    ·2.5 reaches ~575× at |y|=5, so headroom is cheap there) over the
    measured values.  A wrong norm-param source, band edge, or stitch
    branch shifts these by 2-4 orders.  (On the real TPU the same chain
    measures ~4e-2 relative — MXU default-precision convs, not a chain
    defect; docs/PERFORMANCE.md "Flagship inference parity".)"""
    from test_e2e_inference import _oracle_infer

    from mdctgan_tpu.data.dataset import AudioAppDataset
    from mdctgan_tpu.train.step import build_inference_fn

    cfg = SpectralConfig()  # the defaults ARE the flagship transform
    transform = SpectralTransform(cfg)

    torch_g = _torch_local(FLAGSHIP_LOCAL)
    _randomize(torch_g, rng)
    torch_g.eval()
    flax_g = _flax_local(FLAGSHIP_LOCAL)
    params, stats = import_torch.import_generator(
        torch_g.state_dict(), flax_g)
    g_vars = {"params": params, "batch_stats": stats}

    seg, overlap = cfg.segment_length, 512  # generate_audio.sh gen_overlap
    long_audio = (0.1 * rng.standard_normal(int(2.2 * seg))).astype(
        np.float32)
    ds = AudioAppDataset(long_audio, cfg.hr_sampling_rate, seg, overlap)
    seg_rows = ds.segments_of(long_audio)
    n_seg = seg_rows.shape[0]
    assert 2 <= n_seg <= 5  # genuinely multi-segment, still fits batch 8
    extra = (0.1 * rng.standard_normal((BATCH - n_seg, seg))).astype(
        np.float32)
    rows = np.concatenate([seg_rows, extra], axis=0)

    ref_sr, ref_audio = _oracle_infer(torch_g, rows, cfg)

    infer = build_inference_fn(flax_g, transform, out_length=seg)
    sr, sr_audio = infer(g_vars, jnp.asarray(rows))
    sr, sr_audio = np.asarray(sr), np.asarray(sr_audio)

    np.testing.assert_allclose(sr, ref_sr, atol=1.2e-3)
    scale = float(np.abs(ref_audio).max())
    np.testing.assert_allclose(sr_audio, ref_audio, atol=2e-3 * scale)

    # whole-file stitch at flagship shapes (rate-matched branch)
    ours = ds.stitch(sr_audio[:n_seg])
    theirs = ds.stitch(ref_audio[:n_seg])
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(
        ours, theirs, atol=2e-3 * float(np.abs(theirs).max()))
