"""The fused GAN train step — one jitted program per step.

The reference runs, per iteration: MDCT preprocessing, a G forward, three D
forwards, two separate backwards and two optimizer steps as distinct CUDA
launches (train.py:160-199, pix2pixHD_model.py:416-451).  Here the whole
schedule compiles into ONE XLA program: both losses are formed in a single
traced function with ``stop_gradient`` expressing the reference's ``.detach()``
semantics, one backward computes both parameter-set gradients, and both Adam
updates run in-place on donated state.  Under a ``jax.sharding.Mesh`` the same
program is data-parallel: batch sharded over the 'data' axis, params
replicated, gradient all-reduces inserted by XLA.

Loss schedule parity:
  * loss_D = 0.5 * (LSGAN(D(lr, sg(sr)), 0) + LSGAN(D(lr, hr), 1))
  * loss_G = LSGAN(D_sg(lr, sr), 1) + FeatMatch(D_sg(lr, sr), sg(D(lr, hr)))
where sg = stop_gradient, and D_sg means D evaluated with stop-gradded
*parameters* (grad flows to G through the fake pair, never to D — the
reference achieves this by giving optimizer_G only G's params).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mdctgan_tpu.models.losses import feature_matching_loss, gan_loss
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.train.state import GANTrainState

Array = jax.Array


def _nchw_to_nhwc(x: Array) -> Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def _nhwc_to_nchw(x: Array) -> Array:
    return jnp.transpose(x, (0, 3, 1, 2))


def generator_forward(
    generator,
    transform: SpectralTransform,
    g_vars,
    lr_spectro_nchw: Array,
    train: bool,
    mutable: bool = False,
    sample_mask: Optional[Array] = None,
):
    """Normalized LR spectro (NCHW) -> SR spectro (NCHW), with the abs input
    channel and fit_residual skip (pix2pixHD_model.py:394-408).

    ``sample_mask`` restricts the attention stack's BatchNorm batch
    statistics to the real rows of a padded tail batch (the reference's
    drop_last=False remainder runs a genuinely smaller batch)."""
    cfg = transform.cfg
    g_in = _nchw_to_nhwc(transform.g_input(lr_spectro_nchw))
    if mutable:
        sr, updates = generator.apply(
            g_vars, g_in, train=train, sample_mask=sample_mask,
            mutable=["batch_stats"]
        )
    else:
        sr = generator.apply(g_vars, g_in, train=train,
                             sample_mask=sample_mask)
        updates = None
    sr = _nhwc_to_nchw(sr)
    if cfg.fit_residual:
        sr = sr + lr_spectro_nchw
    return sr, updates


def build_train_step(
    generator,
    discriminator,
    transform: SpectralTransform,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    use_lsgan: bool = True,
    lambda_feat: float = 10.0,
    n_layers_d: int = 3,
    num_d: int = 3,
    use_ganfeat: bool = True,
    donate: bool = True,
    use_pool: bool = False,
) -> Callable[..., Tuple[GANTrainState, Dict[str, Array]]]:
    """When ``use_pool`` the returned step takes two extra args
    ``(pool_old, pool_mask)`` from ``ImagePool.presample`` — per-sample
    replacements for the D_fake input (the reference's fake replay buffer,
    util/image_pool.py) — and emits the current fake concat under the
    ``"fake_concat"`` metrics key for ``ImagePool.commit``."""

    def d_concat(lr_spec, img_spec):
        return jnp.concatenate((lr_spec, transform.g_input(img_spec)), axis=1)

    def d_apply(d_params, lr_spec, img_spec):
        """D on the concatenated (LR, image[, abs]) channels
        (pix2pixHD_model.py:420-440): inputs are NCHW spectro images."""
        return discriminator.apply(
            {"params": d_params}, _nchw_to_nhwc(d_concat(lr_spec, img_spec))
        )

    def d_apply_concat(d_params, concat):
        return discriminator.apply({"params": d_params}, _nchw_to_nhwc(concat))

    def loss_fn(g_params, d_params, batch_stats, lr_audio, hr_audio, rng,
                pool_old, pool_mask, sample_mask):
        rng_lr, rng_hr = jax.random.split(rng)
        lr_spec, _, _ = transform.lr_forward(lr_audio, rng=rng_lr)
        hr_spec, _, _ = transform.hr_forward(hr_audio, rng=rng_hr)
        lr_spec = jax.lax.stop_gradient(lr_spec)
        hr_spec = jax.lax.stop_gradient(hr_spec)

        g_vars = {"params": g_params, "batch_stats": batch_stats}
        sr_spec, updates = generator_forward(
            generator, transform, g_vars, lr_spec, train=True, mutable=True,
            sample_mask=sample_mask,
        )

        d_params_sg = jax.tree.map(jax.lax.stop_gradient, d_params)
        pred_fake_g = d_apply(d_params_sg, lr_spec, sr_spec)  # grads -> G only
        fake_concat = d_concat(lr_spec, jax.lax.stop_gradient(sr_spec))
        if use_pool:
            # Per-sample mix of replayed old fakes and current fakes
            # (pix2pixHD_model.py:366-374 discriminate_F(use_pool=True)).
            m = pool_mask.astype(fake_concat.dtype).reshape(-1, 1, 1, 1)
            d_fake_in = m * pool_old + (1.0 - m) * fake_concat
        else:
            d_fake_in = fake_concat
        # The D_fake and D_real passes share live d_params (the reference runs
        # them as two separate forward calls, pix2pixHD_model.py:429-435);
        # batching them into ONE 2B D call halves kernel launches and doubles
        # MXU occupancy per conv.  Split the per-scale features afterwards.
        real_concat = d_concat(lr_spec, hr_spec)
        both = d_apply_concat(
            d_params, jnp.concatenate((d_fake_in, real_concat), axis=0)
        )
        bsz = lr_spec.shape[0]
        pred_fake_d = [[f[:bsz] for f in scale] for scale in both]
        pred_real = [[f[bsz:] for f in scale] for scale in both]

        loss_g_gan = gan_loss(pred_fake_g, True, use_lsgan,
                              sample_weight=sample_mask)
        loss_g_feat = (
            feature_matching_loss(pred_fake_g, pred_real, n_layers_d, num_d,
                                  lambda_feat, sample_weight=sample_mask)
            if use_ganfeat
            else jnp.zeros(())
        )
        loss_d_fake = gan_loss(pred_fake_d, False, use_lsgan,
                               sample_weight=sample_mask)
        loss_d_real = gan_loss(pred_real, True, use_lsgan,
                               sample_weight=sample_mask)

        loss_g = loss_g_gan + loss_g_feat
        loss_d = 0.5 * (loss_d_fake + loss_d_real)
        total = loss_g + loss_d
        metrics = {
            "G_GAN": loss_g_gan,
            "G_GAN_Feat": loss_g_feat,
            "D_real": loss_d_real,
            "D_fake": loss_d_fake,
            "loss_G": loss_g,
            "loss_D": loss_d,
        }
        new_stats = updates["batch_stats"] if updates else batch_stats
        if use_pool:
            metrics["fake_concat"] = fake_concat
        return total, (metrics, new_stats)

    def train_step(state: GANTrainState, batch: Dict[str, Array], rng: Array,
                   pool_old: Optional[Array] = None,
                   pool_mask: Optional[Array] = None,
                   sample_mask: Optional[Array] = None):
        """``sample_mask`` (B,) 0/1 weights the final partial batch per epoch
        (the reference's drop_last=False remainder) without changing the
        compiled batch shape; None (the default) = every sample counts.
        The mask also threads into the generator so the attention stack's
        BatchNorm batch statistics use only the real rows — matching the
        reference's smaller remainder batch exactly (every other norm is
        per-sample)."""
        grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)
        (g_grads, d_grads), (metrics, new_stats) = grad_fn(
            state.g_params,
            state.d_params,
            state.batch_stats,
            batch["lr_audio"],
            batch["hr_audio"],
            rng,
            pool_old,
            pool_mask,
            sample_mask,
        )
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        new_state = state.replace(
            step=state.step + 1,
            g_params=optax.apply_updates(state.g_params, g_updates),
            d_params=optax.apply_updates(state.d_params, d_updates),
            batch_stats=new_stats,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def build_inference_fn(
    generator,
    transform: SpectralTransform,
    out_length: Optional[int] = None,
) -> Callable:
    """Jitted LR waveform -> SR waveform (pix2pixHD_model.py:618-638),
    including the fit_residual LR-band 1e-3 rescale quirk (:631-635)."""
    cfg = transform.cfg

    @jax.jit
    def infer(g_vars, lr_audio: Array, rng: Optional[Array] = None):
        lr_spec, lr_pha, lr_np = transform.lr_forward(lr_audio)
        g_in = _nchw_to_nhwc(transform.g_input(lr_spec))
        sr = _nhwc_to_nchw(generator.apply(g_vars, g_in, train=False))
        if cfg.fit_residual:
            lr_part = int(sr.shape[-1] / cfg.up_ratio)
            sr = sr.at[..., :lr_part].multiply(1e-3)
            sr = sr + lr_spec
        # NB: SR is denormalized with the *LR* norm params — intentional
        # (pix2pixHD_model.py:636; matched ranges via --abs_norm).
        # ``rng`` feeds the non-arcsinh path's random +/-1 pseudo-phase for
        # the synthesized band (pix2pixHD_model.py:150-157); with rng=None
        # that band reconstructs with constant +1 phase instead.
        sr_audio = transform.to_audio(sr, lr_np, lr_pha, rng=rng,
                                      out_length=out_length)
        return sr, sr_audio

    return infer
