"""End-to-end train-step tests on a tiny geometry: losses finite, params
update, D and G both learn signs, and the same step runs batch-sharded on an
8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mdctgan_tpu.models.discriminator import MultiscaleDiscriminator
from mdctgan_tpu.models.generator import GlobalGenerator
from mdctgan_tpu.ops.features import SpectralConfig, SpectralTransform
from mdctgan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mdctgan_tpu.train.state import create_train_state
from mdctgan_tpu.train.step import build_train_step, build_inference_fn

# Tiny geometry: n_fft=64 -> spectro (bins, 32); segment 31*32=992 -> 32 bins.
TINY = SpectralConfig(
    n_fft=64, hop_length=32, win_length=64, segment_length=992,
    lr_sampling_rate=16000, hr_sampling_rate=48000,
)


def make_setup(num_d=2, n_layers_d=2):
    tf = SpectralTransform(TINY)
    gen = GlobalGenerator(
        input_nc=2, output_nc=1, ngf=4, n_downsampling=2, n_blocks=1,
        n_attn=1, heads=2, dim_head=4, input_size=(32, 32),
        downsample_type="resconv", upsample_type="interpolate",
    )
    disc = MultiscaleDiscriminator(ndf=4, n_layers=n_layers_d, num_D=num_d)
    g_tx = optax.adam(2e-4, b1=0.5)
    d_tx = optax.adam(2e-4, b1=0.5)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
        spectro_shape=(32, 32), g_in_channels=2, d_in_channels=3,
    )
    step = build_train_step(
        gen, disc, tf, g_tx, d_tx, num_d=num_d, n_layers_d=n_layers_d,
        donate=False,
    )
    return tf, gen, disc, state, step


def make_batch(rng, b=4):
    t = TINY.segment_length
    hr = 0.1 * rng.standard_normal((b, t)).astype(np.float32)
    lr = hr + 0.01 * rng.standard_normal((b, t)).astype(np.float32)
    return {"lr_audio": jnp.asarray(lr), "hr_audio": jnp.asarray(hr)}


def test_train_step_updates_and_finite(rng):
    tf, gen, disc, state, step = make_setup()
    batch = make_batch(rng)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    # both G and D moved
    g_delta = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                           state.g_params, new_state.g_params)
    d_delta = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                           state.d_params, new_state.d_params)
    assert max(jax.tree.leaves(g_delta)) > 0
    assert max(jax.tree.leaves(d_delta)) > 0


def test_loss_decreases_over_steps(rng):
    tf, gen, disc, state, step = make_setup()
    batch = make_batch(rng)
    first = None
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss_D"])
    # D should get better at separating real/fake on a fixed batch
    assert float(metrics["loss_D"]) < first


def test_inference_fn_shapes(rng):
    tf, gen, disc, state, step = make_setup()
    infer = build_inference_fn(gen, tf, out_length=TINY.segment_length)
    batch = make_batch(rng, b=2)
    g_vars = {"params": state.g_params, "batch_stats": state.batch_stats}
    sr_spec, sr_audio = infer(g_vars, batch["lr_audio"])
    assert sr_spec.shape == (2, 1, 32, 32)
    assert sr_audio.shape == (2, TINY.segment_length)
    assert np.isfinite(np.asarray(sr_audio)).all()


def test_inference_db_path_random_pseudo_phase(rng):
    """Non-arcsinh (dB) configs reconstruct the synthesized band with a
    random +/-1 pseudo-phase at inference (pix2pixHD_model.py:150-157):
    passing an rng to the inference fn must randomize that band (different
    keys -> different audio), while rng=None stays deterministic."""
    cfg = dataclasses.replace(
        TINY, arcsinh_transform=False, abs_norm=False, fit_residual=False
    )
    tf = SpectralTransform(cfg)
    gen = GlobalGenerator(
        input_nc=1, output_nc=1, ngf=4, n_downsampling=2, n_blocks=1,
        n_attn=0, input_size=(32, 32),
    )
    g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                      train=False)
    infer = build_inference_fn(gen, tf, out_length=cfg.segment_length)
    batch = make_batch(rng, b=2)
    _, a_none = infer(g_vars, batch["lr_audio"])
    _, a_none2 = infer(g_vars, batch["lr_audio"])
    np.testing.assert_array_equal(np.asarray(a_none), np.asarray(a_none2))
    _, a_k0 = infer(g_vars, batch["lr_audio"], jax.random.PRNGKey(1))
    _, a_k1 = infer(g_vars, batch["lr_audio"], jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(a_k0)).all()
    assert np.abs(np.asarray(a_k0) - np.asarray(a_k1)).max() > 0
    assert np.abs(np.asarray(a_k0) - np.asarray(a_none)).max() > 0


def test_train_step_multichip_mesh(rng):
    """The same jitted step under an 8-device data-parallel mesh."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    tf, gen, disc, state, step = make_setup()
    mesh = make_mesh(8)
    state = replicate(state, mesh)
    batch = shard_batch(make_batch(rng, b=8), mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_G"]))
    # params stay replicated
    leaf = jax.tree.leaves(new_state.g_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_invariance_1_vs_8_devices(rng):
    """The actual data-parallel correctness claim (SURVEY §2.3: gradient
    all-reduce implicit in the batch sharding): the SAME global batch from
    the SAME initial state on a 1-device mesh and on an 8-device DP mesh
    must yield the same metrics and the same updated params up to f32
    reduction-order noise.  The param check runs with SGD(lr=1) so the
    update delta IS the all-reduced gradient (Adam's first-step g/(|g|+eps)
    would amplify reduction noise in near-zero-gradient elements by
    ~lr/eps); Adam metrics equality is asserted separately.  The per-leaf
    bound scales with the gradient magnitude: on 8 devices each device
    convolves a batch-1 shard, so XLA picks different conv algorithms /
    reduction orders than the batch-8 single-device program, giving
    relative f32 noise (measured ~5e-5 of O(10) gradients), not absolute."""
    assert len(jax.devices()) >= 8
    tf, gen, disc, adam_state, adam_step = make_setup()
    tx = optax.sgd(1.0)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx, tx,
        spectro_shape=(32, 32), g_in_channels=2, d_in_channels=3,
    )
    step = build_train_step(gen, disc, tf, tx, tx, num_d=2, n_layers_d=2,
                            donate=False)
    batch = make_batch(rng, b=8)
    key = jax.random.PRNGKey(0)

    def run(step_fn, st, n_dev):
        mesh = make_mesh(n_dev)
        new_state, metrics = step_fn(
            replicate(st, mesh), shard_batch(batch, mesh), key
        )
        return jax.device_get(new_state), jax.device_get(metrics)

    s1, m1 = run(step, state, 1)
    s8, m8 = run(step, state, 8)
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=5e-5, atol=1e-6,
                                   err_msg=k)
    for label, t0, t1, t8 in (
        ("g_params", state.g_params, s1.g_params, s8.g_params),
        ("d_params", state.d_params, s1.d_params, s8.d_params),
        ("batch_stats", state.batch_stats, s1.batch_stats, s8.batch_stats),
    ):
        z_l = [np.asarray(x) for x in jax.tree.leaves(t0)]
        a_l = [np.asarray(x) for x in jax.tree.leaves(t1)]
        b_l = [np.asarray(x) for x in jax.tree.leaves(t8)]
        # |delta| = |grad| under SGD(1); noise in one leaf couples to the
        # whole tree through shared upstream activations, so the relevant
        # scale is the tree-wide gradient magnitude, not per-leaf.
        scale = max(1.0, max(float(np.abs(a - z).max())
                             for a, z in zip(a_l, z_l)))
        for a, b in zip(a_l, b_l):
            err = float(np.abs(a - b).max())
            assert err <= 2e-4 * scale, (
                f"{label}: max|diff|={err:.3e} vs tree scale {scale:.3e}")

    # the shipped Adam step: losses identical across mesh sizes too
    _, am1 = run(adam_step, adam_state, 1)
    _, am8 = run(adam_step, adam_state, 8)
    for k in am1:
        np.testing.assert_allclose(am1[k], am8[k], rtol=5e-5, atol=1e-6,
                                   err_msg=k)


def test_train_step_multichip_mesh_fused_pallas(rng):
    """The sharded step with the fused Pallas transforms dispatched via
    shard_map (interpret mode on the CPU mesh) — metrics must match the
    unfused step on the same batch."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    tf_fused = SpectralTransform(TINY, use_fused=True, fused_interpret=True,
                                 mesh=mesh)
    tf_plain, gen, disc, state, step_plain = make_setup()
    import optax as _optax
    g_tx = _optax.adam(2e-4, b1=0.5)
    d_tx = _optax.adam(2e-4, b1=0.5)
    step_fused = build_train_step(gen, disc, tf_fused, g_tx, d_tx,
                                  n_layers_d=2, num_d=2, donate=False)
    state = replicate(state, mesh)
    batch = shard_batch(make_batch(rng, b=8), mesh)
    key = jax.random.PRNGKey(0)
    _, m_plain = step_plain(state, batch, key)
    _, m_fused = step_fused(state, batch, key)
    for k in ("loss_G", "loss_D", "G_GAN_Feat"):
        np.testing.assert_allclose(float(m_fused[k]), float(m_plain[k]),
                                   rtol=1e-3, atol=1e-4)


def test_feature_matching_learns_sr(rng):
    """On a fixed band-limited batch, 60 steps of the fused GAN step must pull
    the generator's features toward the HR targets (G_GAN_Feat trend down) —
    the learning signal the reference trains on (pix2pixHD_model.py:443-451)."""
    tf, gen, disc, state, step = make_setup()
    t = TINY.segment_length
    # genuinely band-limited LR: keep only the low third of a tone mixture
    n = np.arange(t)
    hr = sum(0.2 * np.sin(2 * np.pi * f * n / 48000.0)
             for f in (400.0, 3000.0, 9000.0, 18000.0))
    hr = np.tile(hr.astype(np.float32), (4, 1))
    lr = sum(0.2 * np.sin(2 * np.pi * f * n / 48000.0) for f in (400.0, 3000.0))
    lr = np.tile(lr.astype(np.float32), (4, 1))
    batch = {"lr_audio": jnp.asarray(lr), "hr_audio": jnp.asarray(hr)}
    feats = []
    for i in range(60):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        feats.append(float(metrics["G_GAN_Feat"]))
    assert np.mean(feats[-5:]) < np.mean(feats[:5])
    assert all(np.isfinite(feats))


def test_gradient_accumulation_matches_plain_step(rng):
    """optax.MultiSteps(k=2) with the same micro-batch twice == one plain
    Adam step on that batch (averaging identical grads is a no-op)."""
    from mdctgan_tpu.models.discriminator import MultiscaleDiscriminator
    from mdctgan_tpu.models.generator import GlobalGenerator
    from mdctgan_tpu.train.schedule import make_optimizers

    tf = SpectralTransform(TINY)
    gen = GlobalGenerator(
        input_nc=2, output_nc=1, ngf=4, n_downsampling=2, n_blocks=1,
        n_attn=1, heads=2, dim_head=4, input_size=(32, 32),
        downsample_type="resconv", upsample_type="interpolate",
    )
    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
    batch = {
        "lr_audio": jnp.asarray(0.1 * rng.standard_normal((2, 992)), jnp.float32),
        "hr_audio": jnp.asarray(0.1 * rng.standard_normal((2, 992)), jnp.float32),
    }
    key = jax.random.PRNGKey(3)

    def run(accum):
        g_tx, d_tx = make_optimizers(2e-4, 0.5, 10, 0, steps_per_epoch=10,
                                     accum_steps=accum)
        state = create_train_state(
            jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
            spectro_shape=(32, 32), g_in_channels=2, d_in_channels=3,
        )
        step = build_train_step(gen, disc, tf, g_tx, d_tx,
                                n_layers_d=2, num_d=2, donate=False)
        for _ in range(accum):
            state, metrics = step(state, batch, key)
        return state

    plain = run(1)
    accum = run(2)
    # mid-accumulation the params must NOT move
    g_tx, d_tx = make_optimizers(2e-4, 0.5, 10, 0, 10, accum_steps=2)
    st0 = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
        spectro_shape=(32, 32), g_in_channels=2, d_in_channels=3,
    )
    step2 = build_train_step(gen, disc, tf, g_tx, d_tx,
                             n_layers_d=2, num_d=2, donate=False)
    st1, _ = step2(st0, batch, key)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        st1.g_params, st0.g_params,
    )
    # after the k-th micro-step, params match the plain update
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        accum.g_params, plain.g_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        accum.d_params, plain.d_params,
    )


def test_sample_mask_matches_small_batch(rng):
    """Partial-batch pad+mask (the reference's drop_last=False remainder,
    custom_dataset_data_loader.py:38-44): a step on a batch-4 program with
    sample_mask [1,1,1,0] must produce the same G/D gradients as a step on
    the same first 3 samples at batch 3.  Geometry without BatchNorm
    (n_attn=0) so no cross-sample coupling exists; SGD(lr=1) so the update
    delta IS the gradient."""
    tf = SpectralTransform(TINY)
    gen = GlobalGenerator(
        input_nc=2, output_nc=1, ngf=4, n_downsampling=2, n_blocks=1,
        n_attn=0, heads=2, dim_head=4, input_size=(32, 32),
        downsample_type="resconv", upsample_type="interpolate",
    )
    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
    tx = optax.sgd(1.0)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx, tx,
        spectro_shape=(32, 32), g_in_channels=2, d_in_channels=3,
    )
    step = build_train_step(gen, disc, tf, tx, tx, num_d=2, n_layers_d=2,
                            donate=False)

    batch4 = make_batch(rng, b=4)
    batch3 = {k: v[:3] for k, v in batch4.items()}
    key = jax.random.PRNGKey(7)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    masked, m_metrics = step(state, batch4, key, sample_mask=mask)
    small, s_metrics = step(state, batch3, key)

    for name in ("loss_G", "loss_D"):
        np.testing.assert_allclose(
            float(m_metrics[name]), float(s_metrics[name]), rtol=1e-4)
    for label, a_tree, b_tree in (
        ("G", masked.g_params, small.g_params),
        ("D", masked.d_params, small.d_params),
    ):
        for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
            a, b = np.asarray(a), np.asarray(b)
            err = float(np.linalg.norm((a - b).ravel()))
            bound = 1e-4 * float(np.linalg.norm(b.ravel())) + 5e-5
            assert err <= bound, f"{label}: ||diff||={err:.3e} > {bound:.3e}"

    # sanity: an all-ones mask reproduces the unmasked step (up to f32
    # reduction-order noise: the weighted path reduces per-sample means,
    # the plain path one global mean)
    ones, _ = step(state, batch4, key, sample_mask=jnp.ones(4))
    plain, _ = step(state, batch4, key)
    for a, b in zip(jax.tree.leaves(ones.g_params),
                    jax.tree.leaves(plain.g_params)):
        a, b = np.asarray(a), np.asarray(b)
        err = float(np.linalg.norm((a - b).ravel()))
        bound = 1e-5 * float(np.linalg.norm(b.ravel())) + 5e-5
        assert err <= bound, f"ones-mask: ||diff||={err:.3e} > {bound:.3e}"


def test_sample_mask_matches_small_batch_with_attention_bn(rng):
    """Same pad+mask equivalence with the attention stack PRESENT (n_attn=1):
    the sample_mask threads into the BottleStack's BatchNorm so tail-step
    batch statistics use only the real rows, matching the reference's
    genuinely smaller remainder batch.  Gradients AND the updated
    batch_stats must match the small-batch step."""
    tf = SpectralTransform(TINY)
    gen = GlobalGenerator(
        input_nc=2, output_nc=1, ngf=4, n_downsampling=2, n_blocks=1,
        n_attn=1, heads=2, dim_head=4, input_size=(32, 32),
        downsample_type="resconv", upsample_type="interpolate",
    )
    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
    tx = optax.sgd(1.0)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx, tx,
        spectro_shape=(32, 32), g_in_channels=2, d_in_channels=3,
    )
    step = build_train_step(gen, disc, tf, tx, tx, num_d=2, n_layers_d=2,
                            donate=False)

    batch4 = make_batch(rng, b=4)
    batch3 = {k: v[:3] for k, v in batch4.items()}
    key = jax.random.PRNGKey(7)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    masked, m_metrics = step(state, batch4, key, sample_mask=mask)
    small, s_metrics = step(state, batch3, key)

    for name in ("loss_G", "loss_D"):
        np.testing.assert_allclose(
            float(m_metrics[name]), float(s_metrics[name]), rtol=1e-4)
    for label, a_tree, b_tree in (
        ("G", masked.g_params, small.g_params),
        ("D", masked.d_params, small.d_params),
        ("stats", masked.batch_stats, small.batch_stats),
    ):
        for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
            a, b = np.asarray(a), np.asarray(b)
            err = float(np.linalg.norm((a - b).ravel()))
            # floor 2e-4 (vs 5e-5 in the BN-free test): masked-sum/(n) vs
            # plain-mean statistics reduce in different orders and the
            # rsqrt(var) amplifies the last-ulp difference; a wiring error
            # (unmasked stats seeing the pad row) measures O(1e-2) here.
            bound = 1e-4 * float(np.linalg.norm(b.ravel())) + 2e-4
            assert err <= bound, f"{label}: ||diff||={err:.3e} > {bound:.3e}"


def test_sample_mask_on_mesh(rng):
    """The masked step under the 8-device DP mesh, mask sharded like the
    batch (the --multihost layout): runs, finite, and masking the last 2
    rows changes the losses vs all-ones."""
    from mdctgan_tpu.parallel.mesh import batch_sharding

    assert len(jax.devices()) >= 8
    tf, gen, disc, state, step = make_setup()
    mesh = make_mesh(8)
    state = replicate(state, mesh)
    batch = shard_batch(make_batch(rng, b=8), mesh)
    sharding = batch_sharding(mesh)
    key = jax.random.PRNGKey(0)
    mask_partial = jax.device_put(
        (np.arange(8) < 6).astype(np.float32), sharding)
    mask_ones = jax.device_put(np.ones(8, np.float32), sharding)
    _, m_partial = step(state, batch, key, sample_mask=mask_partial)
    _, m_ones = step(state, batch, key, sample_mask=mask_ones)
    assert np.isfinite(float(m_partial["loss_G"]))
    assert float(m_partial["loss_G"]) != float(m_ones["loss_G"])
