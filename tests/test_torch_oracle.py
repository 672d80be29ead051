"""Layer-level parity against stock torch modules as oracles.

The reference builds everything from torch building blocks whose edge-case
semantics are easy to silently diverge from (SURVEY.md §7 "hard parts"):
InstanceNorm2d without affine, AvgPool2d with count_include_pad=False,
ConvTranspose2d's output_padding geometry, and Conv2d zero padding.  These
tests copy weights into the stock torch layer and demand element-level
agreement — no reference code involved, just the same public torch API the
reference calls.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")


def to_torch_nchw(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def from_torch_nchw(t: "torch.Tensor") -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_instance_norm_matches_torch(rng):
    from mdctgan_tpu.models.layers import instance_norm

    x = rng.standard_normal((3, 9, 13, 5)).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    ref = torch.nn.InstanceNorm2d(5, affine=False, eps=1e-5)(to_torch_nchw(x))
    np.testing.assert_allclose(ours, from_torch_nchw(ref), atol=2e-5)


def test_avg_pool_matches_torch_count_include_pad_false(rng):
    from mdctgan_tpu.models.layers import avg_pool_3x3_s2

    for h, w in ((8, 8), (9, 13), (16, 32)):
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = np.asarray(avg_pool_3x3_s2(jnp.asarray(x)))
        ref = torch.nn.AvgPool2d(3, stride=2, padding=1,
                                 count_include_pad=False)(to_torch_nchw(x))
        np.testing.assert_allclose(ours, from_torch_nchw(ref), atol=1e-6)


def test_conv_matches_torch_padding(rng):
    from mdctgan_tpu.models.layers import Conv

    x = rng.standard_normal((2, 10, 12, 4)).astype(np.float32)
    mod = Conv(6, 3, stride=2, padding=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))

    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    k = np.asarray(params["params"]["conv"]["kernel"])  # HWIO
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy()))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["conv"]["bias"])))
    ref = tconv(to_torch_nchw(x))
    np.testing.assert_allclose(ours, from_torch_nchw(ref), atol=2e-5)


def test_conv_transposed_matches_torch_output_padding(rng):
    from mdctgan_tpu.models.layers import ConvTransposed

    x = rng.standard_normal((2, 7, 11, 4)).astype(np.float32)
    mod = ConvTransposed(5)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert ours.shape == (2, 14, 22, 5)  # exact 2x upsample

    tconv = torch.nn.ConvTranspose2d(4, 5, 3, stride=2, padding=1,
                                     output_padding=1)
    # flax ConvTranspose(transpose_kernel=True) kernel is (H, W, O, I);
    # torch ConvTranspose2d weight is (I, O, kH, kW) — the same mapping
    # train/import_torch.py relies on (no spatial flip).
    k = np.asarray(params["params"]["conv"]["kernel"])
    assert k.shape == (3, 3, 5, 4)
    w = np.transpose(k, (3, 2, 0, 1))  # -> (I, O, H, W)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.copy()))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["conv"]["bias"])))
    ref = tconv(to_torch_nchw(x))
    np.testing.assert_allclose(ours, from_torch_nchw(ref), atol=1e-3)


def test_leaky_relu_matches_torch(rng):
    from mdctgan_tpu.models.layers import leaky_relu

    x = rng.standard_normal(1000).astype(np.float32)
    ours = np.asarray(leaky_relu(jnp.asarray(x)))
    ref = torch.nn.LeakyReLU(0.2)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_kbd_window_matches_torch_recipe():
    """The reference's kbdwin (util/util.py:179-186): cumsum-sqrt over a
    kaiser window with beta*pi, periodic=False — rebuilt here on the torch
    kaiser_window primitive as an oracle."""
    from mdctgan_tpu.ops.window import kbd_window

    for n, beta in ((512, 5.0), (128, 5.0), (64, 4.0)):
        kais = torch.kaiser_window(n // 2 + 1, periodic=False,
                                   beta=beta * np.pi, dtype=torch.float64)
        csum = torch.cumsum(kais, dim=0)
        half = torch.sqrt(csum[:-1] / csum[-1])
        ref = torch.cat((half, half.flip(0))).numpy()
        np.testing.assert_allclose(np.asarray(kbd_window(n, beta)), ref,
                                   atol=1e-12)


def test_batchnorm_train_mode_matches_torch(rng):
    """The hand-rolled BatchNorm2d twin (models/attention.py _BN2D) vs stock
    torch in TRAIN mode: normalized output, and the running-stat updates —
    torch's running_var tracks the UNBIASED batch variance (Bessel n/(n-1)),
    which flax.linen.BatchNorm gets wrong (biased); the twin must match
    torch.  Also: eval mode on the updated stats."""
    from mdctgan_tpu.models.attention import BatchNorm

    b, h, w, c = 4, 5, 6, 3
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(c, momentum=0.1, eps=1e-5)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(
            rng.normal(1.0, 0.02, (c,)).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.normal(0.0, 0.1, (c,)).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(
            rng.normal(0, 0.1, (c,)).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 1.5, (c,)).astype(np.float32)))
    variables = {
        "params": {"bn": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        }},
        "batch_stats": {"bn": {
            # .copy(): torch .numpy() shares memory and the train-mode
            # forward updates running stats IN PLACE
            "mean": jnp.asarray(tbn.running_mean.numpy().copy()),
            "var": jnp.asarray(tbn.running_var.numpy().copy()),
        }},
    }

    tbn.train()
    ref = from_torch_nchw(tbn(to_torch_nchw(x)))
    ours, updates = BatchNorm(use_running_average=False).apply(
        variables, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["var"]),
        tbn.running_var.numpy(), rtol=1e-5)

    tbn.eval()
    ref_eval = from_torch_nchw(tbn(to_torch_nchw(x)))
    updated = dict(variables, batch_stats=updates["batch_stats"])
    ours_eval = BatchNorm(use_running_average=True).apply(
        updated, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval, atol=1e-5)


def test_batchnorm_masked_matches_torch_small_batch(rng):
    """Masked train-mode BN on a padded batch [1,1,1,0] must equal torch
    BatchNorm2d run on the 3 real rows — output rows, running_mean, and the
    Bessel-corrected running_var (the reference's drop_last=False remainder
    batch IS the smaller batch; custom_dataset_data_loader.py:38-44)."""
    from mdctgan_tpu.models.attention import BatchNorm

    b, h, w, c = 4, 5, 6, 3
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(c, momentum=0.1, eps=1e-5)
    tbn.train()
    ref = from_torch_nchw(tbn(to_torch_nchw(x[:3])))

    variables = {
        "params": {"bn": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        }},
        "batch_stats": {"bn": {
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
        }},
    }
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    ours, updates = BatchNorm(use_running_average=False).apply(
        variables, jnp.asarray(x), mask, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours)[:3], ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["var"]),
        tbn.running_var.numpy(), rtol=1e-5)
