"""GAN objectives (reference: networks.py:97-137 GANLoss;
pix2pixHD_model.py:416-451 loss assembly).

All functions take the nested multiscale prediction lists produced by
``MultiscaleDiscriminator`` and reduce to scalars, entirely inside jit.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

Array = jax.Array


def gan_loss(preds: List[List[Array]], target_is_real: bool, use_lsgan: bool = True) -> Array:
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
            total = total + jnp.mean((pred - target) ** 2)
        else:
            eps = 1e-12
            p = jnp.clip(pred, eps, 1 - eps)
            total = total + jnp.mean(
                -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
            )
    return total


def feature_matching_loss(
    pred_fake: List[List[Array]],
    pred_real: List[List[Array]],
    n_layers_d: int,
    num_d: int,
    lambda_feat: float = 10.0,
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
            total = total + d_weights * feat_weights * lambda_feat * jnp.mean(
                jnp.abs(pred_fake[i][j].astype(jnp.float32) - target)
            )
    return total
