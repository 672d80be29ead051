"""JAX -> torch ``.pth`` checkpoint export (mdctgan_tpu/export_torch_cli.py).

The exporter is the inverse of train/import_torch.py: a state trained here
must come back bit-identical through ``torch.save`` -> ``torch.load`` ->
``import_generator``/``import_discriminator``, and the file layout must be
what the reference's ``BaseModel.load_network`` expects
(<epoch>_net_G.pth / <epoch>_net_D.pth with nn.Sequential index keys).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_opt():
    from mdctgan_tpu.options import TrainOptions

    return TrainOptions().parse(
        [
            "--netG", "local", "--ngf", "4", "--n_downsample_global", "2",
            "--n_blocks_global", "2", "--n_blocks_attn_g", "1",
            "--heads_g", "2", "--dim_head_g", "4", "--n_blocks_local", "2",
            "--num_D", "2", "--n_layers_D", "2", "--ndf", "4",
            "--n_fft", "128", "--hop_length", "64", "--win_length", "128",
            "--bins", "128", "--segment_length", "8128", "--center",
            "--upsample_type", "interpolate", "--downsample_type", "resconv",
        ],
        save=False,
    )


def test_partial_restore_ignores_optimizer_structure(tmp_path):
    """Checkpoints trained with --freeze_*/--niter_fix_global carry a MASKED
    (multi_transform) optimizer state; weights-only consumers (inference,
    pth export) must restore regardless via restore_fields (regression: a
    full-state template raised an orbax structure mismatch)."""
    import optax

    from mdctgan_tpu.models.discriminator import build_discriminator
    from mdctgan_tpu.models.generator import build_generator
    from mdctgan_tpu.options import spectral_config_from_opt
    from mdctgan_tpu.train.checkpoint import CheckpointManager
    from mdctgan_tpu.train.freeze import masked_optimizer, param_labels
    from mdctgan_tpu.train.state import create_train_state

    opt = _tiny_opt()
    cfg = spectral_config_from_opt(opt)
    gen = build_generator(opt)
    g_tx = masked_optimizer(
        optax.adam(2e-4), lambda p: param_labels(p, fix_global=True)
    )
    state = create_train_state(
        jax.random.PRNGKey(0), gen, build_discriminator(opt),
        g_tx, optax.adam(2e-4),
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=opt.input_nc,
        d_in_channels=opt.input_nc + opt.output_nc,
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, epoch=1)
    mgr.wait()
    mgr.close()
    g_tmpl = gen.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.n_bins, cfg.n_fft // 2, opt.input_nc)),
        train=False,
    )
    # fresh manager, like the real inference/export processes (one orbax
    # manager instance cannot mix Standard save and PyTree restore handlers)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    sub = mgr.restore_fields(
        {"g_params": g_tmpl["params"],
         "batch_stats": g_tmpl.get("batch_stats", {})}
    )
    mgr.close()
    for a, b in zip(jax.tree.leaves(sub["g_params"]),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_pth_roundtrip(tmp_path):
    from mdctgan_tpu.export_torch_cli import export_state_to_pth
    from mdctgan_tpu.models.discriminator import build_discriminator
    from mdctgan_tpu.models.generator import build_generator
    from mdctgan_tpu.options import spectral_config_from_opt
    from mdctgan_tpu.train.import_torch import (
        import_discriminator,
        import_generator,
        load_pth,
    )
    from mdctgan_tpu.train.schedule import make_optimizers
    from mdctgan_tpu.train.state import create_train_state

    opt = _tiny_opt()
    cfg = spectral_config_from_opt(opt)
    gen = build_generator(opt)
    g_tx, d_tx = make_optimizers(2e-4, 0.5, 1, 0, 1)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, build_discriminator(opt), g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=opt.input_nc,
        d_in_channels=opt.input_nc + opt.output_nc,
    )

    written = export_state_to_pth(state, gen, opt, str(tmp_path), "latest")
    assert sorted(p.split("/")[-1] for p in written) == [
        "latest_net_D.pth", "latest_net_G.pth",
    ]

    # reference-format sanity: Sequential index keys, torch tensors
    sd_g = load_pth(str(tmp_path / "latest_net_G.pth"))
    assert any(k.startswith("model.1.") for k in sd_g)  # stem conv after pad
    assert all(isinstance(v, torch.Tensor) for v in sd_g.values())

    # bit-exact roundtrip through the importer
    params, stats = import_generator(sd_g, gen)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sd_d = load_pth(str(tmp_path / "latest_net_D.pth"))
    d_params = import_discriminator(sd_d, opt.num_D, opt.n_layers_D)
    for a, b in zip(jax.tree.leaves(d_params), jax.tree.leaves(state.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_generator_matches_forward(tmp_path):
    """Weights exported then re-imported must produce an identical forward
    pass (guards against silent transpose mistakes the tree-equality check
    could miss if both directions made the same error... exercised through
    an actual torch conv in tests/test_import.py; here: self-consistency)."""
    from mdctgan_tpu.export_torch_cli import export_state_to_pth
    from mdctgan_tpu.models.discriminator import build_discriminator
    from mdctgan_tpu.models.generator import build_generator
    from mdctgan_tpu.options import spectral_config_from_opt
    from mdctgan_tpu.train.import_torch import import_generator, load_pth
    from mdctgan_tpu.train.schedule import make_optimizers
    from mdctgan_tpu.train.state import create_train_state

    opt = _tiny_opt()
    cfg = spectral_config_from_opt(opt)
    gen = build_generator(opt)
    g_tx, d_tx = make_optimizers(2e-4, 0.5, 1, 0, 1)
    state = create_train_state(
        jax.random.PRNGKey(1), gen, build_discriminator(opt), g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=opt.input_nc,
        d_in_channels=opt.input_nc + opt.output_nc,
    )
    export_state_to_pth(state, gen, opt, str(tmp_path), "latest")
    params, stats = import_generator(
        load_pth(str(tmp_path / "latest_net_G.pth")), gen
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, cfg.n_bins, cfg.n_fft // 2, opt.input_nc)
        ),
        jnp.float32,
    )
    y0 = gen.apply(
        {"params": state.g_params, "batch_stats": state.batch_stats},
        x, train=False,
    )
    y1 = gen.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_verify_import_cli(tmp_path, capsys):
    """tools/verify_import.py on a just-exported checkpoint must report 100%
    matched (exit 0) for both nets, and a wrong --n_blocks_global must be
    caught (exit 1) with size-matched candidate hints."""
    import importlib.util
    import os

    from mdctgan_tpu.export_torch_cli import export_state_to_pth
    from mdctgan_tpu.models.discriminator import build_discriminator
    from mdctgan_tpu.models.generator import build_generator
    from mdctgan_tpu.options import spectral_config_from_opt
    from mdctgan_tpu.train.schedule import make_optimizers
    from mdctgan_tpu.train.state import create_train_state

    spec = importlib.util.spec_from_file_location(
        "verify_import",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "verify_import.py"),
    )
    vi = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vi)

    opt = _tiny_opt()
    cfg = spectral_config_from_opt(opt)
    gen = build_generator(opt)
    g_tx, d_tx = make_optimizers(2e-4, 0.5, 1, 0, 1)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, build_discriminator(opt), g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=opt.input_nc,
        d_in_channels=opt.input_nc + opt.output_nc,
    )
    export_state_to_pth(state, gen, opt, str(tmp_path), "latest")

    flags = [
        "--netG", "local", "--ngf", "4", "--n_downsample_global", "2",
        "--n_blocks_global", "2", "--n_blocks_attn_g", "1",
        "--heads_g", "2", "--dim_head_g", "4", "--n_blocks_local", "2",
        "--num_D", "2", "--n_layers_D", "2", "--ndf", "4",
        "--n_fft", "128", "--hop_length", "64", "--win_length", "128",
        "--bins", "128", "--segment_length", "8128", "--center",
        "--upsample_type", "interpolate", "--downsample_type", "resconv",
    ]
    assert vi.main([str(tmp_path / "latest_net_G.pth")] + flags) == 0
    assert vi.main([str(tmp_path / "latest_net_D.pth")] + flags) == 0
    out = capsys.readouterr().out
    assert "100% matched" in out

    bad = list(flags)
    bad[bad.index("--n_blocks_global") + 1] = "3"
    assert vi.main([str(tmp_path / "latest_net_G.pth")] + bad) == 1
    out = capsys.readouterr().out
    assert "MISSING" in out and "size-matched candidates" in out
