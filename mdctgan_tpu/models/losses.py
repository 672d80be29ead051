"""GAN objectives (reference: networks.py:97-137 GANLoss;
pix2pixHD_model.py:416-451 loss assembly).

All functions take the nested multiscale prediction lists produced by
``MultiscaleDiscriminator`` and reduce to scalars, entirely inside jit.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _wmean(x: Array, w: Optional[Array]) -> Array:
    """Mean of ``x``, or — with per-sample weights ``w`` of shape (B,) —
    the weighted mean over samples of per-sample means.  With 0/1 weights
    this equals the plain mean over only the weighted samples (the final
    partial batch per epoch: the reference's drop_last=False DataLoader
    yields it smaller, custom_dataset_data_loader.py:38-44; here the batch
    stays the compiled size and padding rows carry weight 0)."""
    if w is None:
        return jnp.mean(x)
    per = jnp.mean(x.reshape(x.shape[0], -1), axis=1)
    w = w.astype(per.dtype)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def gan_loss(
    preds: List[List[Array]],
    target_is_real: bool,
    use_lsgan: bool = True,
    sample_weight: Optional[Array] = None,
) -> Array:
    """LSGAN (MSE vs 0/1) or BCE, summed over scales; each scale's final
    element is the patch logit map (networks.py:127-137)."""
    target = 1.0 if target_is_real else 0.0
    total = 0.0
    for scale in preds:
        # patch logits may be bf16 under the fp16 policy; reduce in f32 so
        # the loss scalar keeps full precision (losses stay f32, like
        # feature_matching_loss below)
        pred = scale[-1].astype(jnp.float32)
        if use_lsgan:
            total = total + _wmean((pred - target) ** 2, sample_weight)
        else:
            eps = 1e-12
            p = jnp.clip(pred, eps, 1 - eps)
            total = total + _wmean(
                -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p)),
                sample_weight,
            )
    return total


def feature_matching_loss(
    pred_fake: List[List[Array]],
    pred_real: List[List[Array]],
    n_layers_d: int,
    num_d: int,
    lambda_feat: float = 10.0,
    sample_weight: Optional[Array] = None,
) -> Array:
    """L1 feature matching over all intermediate features, real side detached
    (pix2pixHD_model.py:443-451)."""
    feat_weights = 4.0 / (n_layers_d + 1)
    d_weights = 1.0 / num_d
    total = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            # intermediate feats may be bf16 under the fp16 policy; reduce in
            # f32 so the loss scalar keeps full precision
            target = jax.lax.stop_gradient(pred_real[i][j]).astype(jnp.float32)
            total = total + d_weights * feat_weights * lambda_feat * _wmean(
                jnp.abs(pred_fake[i][j].astype(jnp.float32) - target),
                sample_weight,
            )
    return total
