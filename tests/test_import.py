"""Torch-checkpoint importer tests.

Two layers of assurance (the HF pretrained checkpoint itself is not available
in this offline environment):
  * layer-level parity against REAL torch ops — validates every weight-layout
    convention the converter uses (conv NCHW->HWIO, transposed-conv flip,
    BatchNorm running stats);
  * export->import round-trip through the full mapping table for both
    generator architectures and the discriminator — validates the
    index-naming replay of the reference's nn.Sequential layout
    (base_model.py:49-111 load path; networks.py sequential construction).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402
import torch  # noqa: E402

from mdctgan_tpu.models.layers import Conv, ConvTransposed  # noqa: E402
from mdctgan_tpu.train import import_torch  # noqa: E402


# --------------------------------------------------------------------------
# layer-level parity vs real torch
# --------------------------------------------------------------------------

def test_conv_weight_conversion_matches_torch(rng):
    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    w = tconv.weight.detach().numpy()
    params = {
        "conv": {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": tconv.bias.detach().numpy(),
        }
    }
    ours = Conv(5, 3, 2, 1).apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=1e-5
    )


def test_transposed_conv_conversion_matches_torch(rng):
    tconv = torch.nn.ConvTranspose2d(4, 6, 3, stride=2, padding=1, output_padding=1)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    w = tconv.weight.detach().numpy()  # (I, O, kH, kW)
    params = {
        "conv": {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": tconv.bias.detach().numpy(),
        }
    }
    ours = ConvTransposed(6, 3, 2).apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    assert ours.shape == (1, 16, 16, 6)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=1e-5
    )


def test_batchnorm_conversion_matches_torch(rng):
    import flax.linen as nn

    tbn = torch.nn.BatchNorm2d(4)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.standard_normal(4).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.standard_normal(4).astype(np.float32)))
        tbn.running_mean.copy_(
            torch.from_numpy(rng.standard_normal(4).astype(np.float32))
        )
        tbn.running_var.copy_(
            torch.from_numpy(np.abs(rng.standard_normal(4)).astype(np.float32) + 0.5)
        )
    tbn.eval()
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x)).numpy()

    ours = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5).apply(
        {
            "params": {
                "scale": tbn.weight.detach().numpy(),
                "bias": tbn.bias.detach().numpy(),
            },
            "batch_stats": {
                "mean": tbn.running_mean.numpy(),
                "var": tbn.running_var.numpy(),
            },
        },
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=1e-5
    )


# --------------------------------------------------------------------------
# full mapping-table round trips
# --------------------------------------------------------------------------

def _tree_allclose(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for k, v in fa:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(fb[jax.tree_util.keystr(k)]), atol=0,
            err_msg=jax.tree_util.keystr(k),
        )


@pytest.mark.parametrize("kind", ["global", "local", "local_attn", "local_n2"])
def test_generator_export_import_roundtrip(kind):
    from mdctgan_tpu.models.generator import GlobalGenerator, LocalEnhancer

    if kind == "global":
        gen = GlobalGenerator(
            input_nc=2, output_nc=1, ngf=4, n_downsampling=2, n_blocks=2,
            n_attn=1, heads=2, dim_head=4, input_size=(32, 32),
            downsample_type="resconv", upsample_type="interpolate",
        )
    elif kind == "local":
        gen = LocalEnhancer(
            input_nc=2, output_nc=1, ngf=4, n_downsample_global=2,
            n_blocks_global=2, n_blocks_local=1, n_attn_global=1,
            heads_g=2, dim_head_g=4, input_size=(64, 64),
            downsample_type="resconv", upsample_type="interpolate",
        )
    elif kind == "local_attn":
        # local attention inserts the reference's SHARED down/up modules
        # ([layer, norm, relu] * k, networks.py:224-226,236-237), whose
        # tensors a torch state_dict lists under EVERY Sequential index —
        # regression: imports must consume all duplicates, exports emit them
        gen = LocalEnhancer(
            input_nc=2, output_nc=1, ngf=4, n_downsample_global=2,
            n_blocks_global=2, n_blocks_local=1, n_attn_global=0,
            n_attn_local=1, heads_l=2, dim_head_l=4, input_size=(64, 64),
            downsample_type="resconv", upsample_type="interpolate",
        )
    else:
        # two enhancer branches: torch keys model1_*/model2_*, with the head
        # only on the last branch (upstream pix2pixHD model%d_1 loop)
        gen = LocalEnhancer(
            input_nc=2, output_nc=1, ngf=4, n_local_enhancers=2,
            n_downsample_global=2, n_blocks_global=1, n_blocks_local=1,
            n_attn_global=0, n_attn_local=0, input_size=(64, 64),
            downsample_type="conv", upsample_type="transconv",
        )
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, *gen.input_size, 2)),
                 train=False)
    entries = import_torch.generator_entries_for(gen)
    sd = import_torch.export_to_torch_keys(
        v["params"], v.get("batch_stats", {}), entries
    )
    # every torch key must be consumed and every param restored bit-exactly
    params, stats = import_torch.import_generator(sd, gen)
    _tree_allclose(v["params"], params)
    if v.get("batch_stats"):
        _tree_allclose(v["batch_stats"], stats)
    # imported params must actually run
    out = gen.apply({"params": params, "batch_stats": stats},
                    jnp.zeros((1, *gen.input_size, 2)), train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_export_import_roundtrip():
    from mdctgan_tpu.models.discriminator import MultiscaleDiscriminator

    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_D=2)
    v = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    entries = import_torch.discriminator_entries(2, 2)
    sd = import_torch.export_to_torch_keys(v["params"], {}, entries)
    params = import_torch.import_discriminator(sd, 2, 2)
    _tree_allclose(v["params"], params)


# --------------------------------------------------------------------------
# fuzzy fallback ladder (reference base_model.py:61-111)
# --------------------------------------------------------------------------

def _small_global():
    from mdctgan_tpu.models.generator import GlobalGenerator

    gen = GlobalGenerator(
        input_nc=2, output_nc=1, ngf=4, n_downsampling=2, n_blocks=1,
        n_attn=0, input_size=(32, 32),
    )
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)), train=False)
    entries = import_torch.generator_entries_for(gen)
    sd = import_torch.export_to_torch_keys(v["params"], {}, entries)
    return gen, v, sd


def test_import_drops_excessive_keys(capsys):
    # reference base_model.py:66-70: pretrained with EXTRA keys loads via
    # key intersection ("excessive layers") instead of failing
    gen, v, sd = _small_global()
    sd["model.999.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    params, _ = import_torch.import_generator(sd, gen)
    _tree_allclose(v["params"], params)
    assert "excessive layers" in capsys.readouterr().out


def test_import_missing_key_raises_without_init():
    gen, v, sd = _small_global()
    del sd["model.1.weight"]
    with pytest.raises(ValueError, match="missing"):
        import_torch.import_generator(sd, gen)


def test_import_missing_key_falls_back_to_init(capsys):
    # reference base_model.py:71-111: "fewer layers" keeps the net's own
    # init for unmatched modules and prints size-matched candidates
    gen, v, sd = _small_global()
    stray = sd.pop("model.1.weight")
    sd["model.777.weight"] = stray  # same-shaped stray key -> candidate line
    params, _ = import_torch.import_generator(sd, gen, init_vars=v)
    out = capsys.readouterr().out
    assert "fewer layers" in out
    assert "model.1.weight : model.777.weight" in out
    # the missing stem conv fell back to the init values
    np.testing.assert_allclose(
        np.asarray(params["stem"]["conv"]["kernel"]),
        np.asarray(v["params"]["stem"]["conv"]["kernel"]),
    )
    # everything else imported
    np.testing.assert_allclose(
        np.asarray(params["head"]["conv"]["kernel"]),
        np.asarray(v["params"]["head"]["conv"]["kernel"]),
    )


def test_import_param_key_map_renames():
    # reference base_model.py:74-85: --param_key_map a.b:c renames module
    # index b -> c for keys that do not match the model
    gen, v, sd = _small_global()
    renamed = {
        (k.replace("model.1.", "model.901.") if k.startswith("model.1.") else k): v2
        for k, v2 in sd.items()
    }
    with pytest.raises(ValueError, match="missing"):
        import_torch.import_generator(renamed, gen)
    params, _ = import_torch.import_generator(
        renamed, gen, param_key_map={"model.901": "1"}
    )
    _tree_allclose(v["params"], params)


def test_import_shape_mismatch_falls_back_to_init(capsys):
    # reference base_model.py:76 treats size-mismatched keys like missing
    # ones (keeps the net's init); importing them raw would crash apply
    gen, v, sd = _small_global()
    good = sd["model.1.weight"]
    sd["model.1.weight"] = np.zeros((7, 2, 7, 7), np.float32)  # wrong ngf
    params, _ = import_torch.import_generator(sd, gen, init_vars=v)
    out = capsys.readouterr().out
    assert "fewer layers" in out
    np.testing.assert_allclose(
        np.asarray(params["stem"]["conv"]["kernel"]),
        np.asarray(v["params"]["stem"]["conv"]["kernel"]),
    )
    # and the result actually runs
    outp = gen.apply({"params": params},
                     jnp.zeros((1, 32, 32, 2)), train=False)
    assert np.isfinite(np.asarray(outp)).all()


def test_import_abstract_init_lazy_materialization():
    """An eval_shape template suffices when every key matches (no device
    init); InitValuesNeeded fires only when the ladder must fill values."""
    gen, v, sd = _small_global()
    abstract = jax.eval_shape(lambda: v)
    params, _ = import_torch.import_generator(sd, gen, init_vars=abstract)
    _tree_allclose(v["params"], params)
    del sd["model.1.weight"]
    with pytest.raises(import_torch.InitValuesNeeded):
        import_torch.import_generator(sd, gen, init_vars=abstract)


def test_import_absent_optional_bias_keeps_init(capsys):
    """An OPTIONAL torch key (conv bias) absent from the checkpoint — e.g. a
    bias-free variant net — must fall back to the init value instead of
    returning a params tree with a missing leaf that only fails later inside
    Module.apply."""
    gen, v, sd = _small_global()
    del sd["model.1.bias"]  # stem conv bias: optional in expected_torch_keys
    params, _ = import_torch.import_generator(sd, gen, init_vars=v)
    assert "keeping init values" in capsys.readouterr().out
    np.testing.assert_array_equal(
        np.asarray(params["stem"]["conv"]["bias"]),
        np.asarray(v["params"]["stem"]["conv"]["bias"]),
    )
    # tree is COMPLETE: same leaf paths as the init template
    import flax.traverse_util as traverse
    assert set(traverse.flatten_dict(params)) == set(
        traverse.flatten_dict(v["params"]))


def test_import_absent_optional_bias_abstract_materializes():
    """Same, but with an abstract (eval_shape) template: the importer must
    signal InitValuesNeeded so callers materialize a real init."""
    gen, v, sd = _small_global()
    del sd["model.1.bias"]
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), v)
    with pytest.raises(import_torch.InitValuesNeeded):
        import_torch.import_generator(sd, gen, init_vars=abstract)
