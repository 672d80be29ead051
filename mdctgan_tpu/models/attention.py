"""Bottleneck-transformer attention stack (Flax, NHWC).

Functional re-implementation of the pinned external dependency
``bottleneck_transformer_pytorch==0.1.4`` (reference requirements.txt:1),
instantiated inside both generators (reference networks.py:338-344 global,
networks.py:218-237 local enhancer) with ``downsample=False`` and
``rel_pos_emb=False``.  Semantics reproduced for checkpoint-import parity:

Each ``BottleBlock`` (BotNet, Srinivas et al. 2021):
    shortcut = Identity                       (dim == dim_out, no downsample)
    net      = Conv1x1(dim -> dim_out/proj_factor, no bias) -> BN -> act
               -> MHSA-2D (q scaled by dim_head**-0.5, absolute 2-D factored
                  positional embeddings added to the logits)
               -> BN -> act
               -> Conv1x1(heads*dim_head -> dim_out, no bias) -> BN
    out      = act(net(x) + shortcut(x))

A ``BottleStack`` of ``num_layers`` chains blocks; with ``downsample=False``
only the first block changes width (dim -> dim_out).

The 2-D attention runs over the whole (tiny) feature map — 8x16 = 128 tokens
for the shipped config — so plain XLA einsum attention saturates the MXU; no
flash-attention kernel is warranted at this size.

BatchNorm uses running stats (torch momentum 0.1 == flax momentum 0.9).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdctgan_tpu.models.layers import conv_init
from mdctgan_tpu.ops.norm import batch_norm2d_train

Array = jax.Array


class AbsPosEmb2D(nn.Module):
    """Factored absolute positional embedding: logits[i, j] = q_i . (h + w)_j."""

    fmap_size: Tuple[int, int]
    dim_head: int

    @nn.compact
    def __call__(self, q: Array) -> Array:
        h, w = self.fmap_size
        scale = self.dim_head ** -0.5
        emb_h = self.param(
            "height", nn.initializers.normal(stddev=scale), (h, self.dim_head)
        )
        emb_w = self.param(
            "width", nn.initializers.normal(stddev=scale), (w, self.dim_head)
        )
        emb = (emb_h[:, None, :] + emb_w[None, :, :]).reshape(h * w, self.dim_head)
        return jnp.einsum("bhid,jd->bhij", q, emb)


class Attention2D(nn.Module):
    """Multi-head self-attention over an NHWC feature map."""

    fmap_size: Tuple[int, int]
    heads: int = 4
    dim_head: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, _ = x.shape
        heads, dh = self.heads, self.dim_head
        inner = heads * dh
        qkv = nn.Conv(
            inner * 3, (1, 1), use_bias=False, kernel_init=conv_init(),
            dtype=self.dtype, name="to_qkv"
        )(x)
        # attention math itself stays in f32 (128-token map — negligible cost)
        if qkv.dtype != jnp.float64:  # f64 only under MDCTGAN_ATTN_F64
            qkv = qkv.astype(jnp.float32)
        qkv = qkv.reshape(b, h * w, 3, heads, dh)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # b,hd,n,d
        q = q * (dh ** -0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        sim = sim + AbsPosEmb2D(self.fmap_size, dh, name="pos_emb")(q)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        return out


class _BN2D(nn.Module):
    """The torch ``BatchNorm2d`` twin proper (momentum 0.1, eps 1e-5),
    hand-rolled so that

      * an optional per-sample ``mask`` restricts batch statistics to the
        real rows of a padded tail batch (the reference's drop_last=False
        remainder runs a genuinely smaller batch — pix2pixHD has no padding;
        masked mean/var reproduce its smaller-batch statistics exactly), and
      * the running-variance update uses torch's Bessel-corrected (unbiased)
        estimator — ``flax.linen.BatchNorm`` records the biased batch
        variance, a small standing deviation from the reference.

    Parameter/stat tree matches ``flax.linen.BatchNorm`` (params scale/bias,
    batch_stats mean/var) so checkpoints and the .pth importer are
    unaffected.  Normalization itself uses the biased variance (both
    frameworks do); statistics accumulate in float32."""

    use_running_average: bool = False
    momentum: float = 0.9  # flax convention: ra = m*ra + (1-m)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        def scale_init(key, shape, dtype=jnp.float32):
            # torch weights_init: BN weight ~ N(1.0, 0.02), bias = 0
            # (networks.py:17-19 overwrites BotNet's zero-gamma init).
            return 1.0 + jax.random.normal(key, shape, dtype) * 0.02

        c = x.shape[-1]
        scale = self.param("scale", scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,))

        # statistics accumulate in f32 (f64 only under the MDCTGAN_ATTN_F64
        # experiment — tools/flagship_grad_truth.py --attn-f64)
        xf = x if x.dtype == jnp.float64 else x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            mul = jax.lax.rsqrt(var + self.epsilon) * scale
            return (xf - mean) * mul + bias

        # Two-pass variance E[(x-mean)^2], not E[x^2]-mean^2: the
        # one-pass form loses ~3 extra decimal digits to cancellation
        # in f32 and its gradient is noisier still — measured 6x the
        # torch-vs-f64 error on the attention stack's tensors at
        # flagship geometry (tools/flagship_grad_truth.py).
        if self.epsilon == 1e-5 and os.environ.get("MDCTGAN_BN_VJP", "1") == "1":
            # (the fused op hard-codes eps 1e-5 — torch's default and the
            # only value this module is ever built with)
            # closed-form custom backward: one fused reduction pass + one
            # elementwise pass instead of XLA autodiff's ~4 passes over
            # (x, g) per norm (ops/norm.py batch_norm2d_train; same move
            # as the instance-norm backward).  MDCTGAN_BN_VJP=0 restores
            # plain autodiff for A/B (tools/ab_bn_vjp.py).
            y, mean, var = batch_norm2d_train(xf, scale, bias, mask)
            if mask is None:
                n = jnp.asarray(
                    x.shape[0] * x.shape[1] * x.shape[2], jnp.float32)
            else:
                n = jnp.sum(mask.astype(jnp.float32)) * (
                    x.shape[1] * x.shape[2])
        else:
            if mask is None:
                n = jnp.asarray(
                    x.shape[0] * x.shape[1] * x.shape[2], jnp.float32)
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            else:
                m = mask.astype(jnp.float32).reshape(-1, 1, 1, 1)
                n = jnp.sum(m) * (x.shape[1] * x.shape[2])
                mean = jnp.sum(xf * m, axis=(0, 1, 2)) / n
                var = jnp.sum(jnp.square(xf - mean) * m, axis=(0, 1, 2)) / n
            y = None
        if not self.is_initializing():
            mom = self.momentum
            # torch: running_var tracks the UNBIASED variance n/(n-1).
            bessel = n / jnp.maximum(n - 1.0, 1.0)
            ra_mean.value = mom * ra_mean.value + (1.0 - mom) * mean
            ra_var.value = mom * ra_var.value + (1.0 - mom) * (bessel * var)
        if y is not None:
            return y
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        return (xf - mean) * mul + bias


class BatchNorm(nn.Module):
    """BatchNorm2d twin (momentum 0.1 torch == 0.9 flax, eps 1e-5) with the
    reference's post-construction N(1, 0.02) weight init (networks.py:17-19 —
    weights_init overwrites BotNet's zero-gamma init).

    ``mask`` (B,) 0/1 — when given in train mode, batch statistics use only
    the rows where mask==1 (the padded-tail-batch case; see ``_BN2D``)."""

    use_running_average: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        return _BN2D(self.use_running_average, name="bn")(
            x, None if self.use_running_average else mask)


class BottleBlock(nn.Module):
    dim_out: int
    fmap_size: Tuple[int, int]
    proj_factor: int = 4
    heads: int = 4
    dim_head: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 mask: Optional[Array] = None) -> Array:
        shortcut = x
        if x.shape[-1] != self.dim_out:
            # BotNet shortcut for dim change without downsample: 1x1 conv path
            # (kernel 1 stride 1 since downsample=False), conv->BN->act.
            s = nn.Conv(
                self.dim_out, (1, 1), use_bias=False, kernel_init=conv_init(),
                dtype=self.dtype, name="shortcut_conv",
            )(x)
            s = BatchNorm(not train, name="shortcut_bn")(s, mask)
            shortcut = nn.relu(s)
        attn_dim_in = self.dim_out // self.proj_factor
        h = nn.Conv(
            attn_dim_in, (1, 1), use_bias=False, kernel_init=conv_init(),
            dtype=self.dtype, name="proj_in"
        )(x)
        h = BatchNorm(not train, name="bn1")(h, mask)
        h = nn.relu(h)
        h = Attention2D(self.fmap_size, self.heads, self.dim_head,
                        dtype=self.dtype, name="attn")(h)
        h = BatchNorm(not train, name="bn2")(h, mask)
        h = nn.relu(h)
        h = nn.Conv(
            self.dim_out, (1, 1), use_bias=False, kernel_init=conv_init(),
            dtype=self.dtype, name="proj_out"
        )(h)
        h = BatchNorm(not train, name="bn3")(h, mask)
        return nn.relu(h + shortcut)


class BottleStack(nn.Module):
    """Stack of BottleBlocks; first block maps dim -> dim_out, rest keep width.

    Matches the reference instantiation ``BottleStack(dim, fmap_size, dim_out,
    num_layers, proj_factor, downsample=False, heads, dim_head, rel_pos_emb=
    False)`` (networks.py:342-343, 233-234)."""

    dim_out: int
    fmap_size: Tuple[int, int]
    num_layers: int = 3
    proj_factor: int = 4
    heads: int = 4
    dim_head: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 mask: Optional[Array] = None) -> Array:
        # MDCTGAN_ATTN_F64=1 (trace-time env, experiment-only): run the whole
        # stack's interior — convs, BN statistics, attention math — in f64 to
        # test the claim that the flagship gradient excess over torch's own
        # f32 noise (~2x block0 -> ~3.9x block2, tools/flagship_grad_truth.py)
        # is f32 accumulation-order noise compounding with depth.  Needs
        # jax_enable_x64; the boundary casts keep the rest of the graph f32.
        f64 = os.environ.get("MDCTGAN_ATTN_F64", "0") == "1"
        if f64:
            x = x.astype(jnp.float64)
        for i in range(self.num_layers):
            x = BottleBlock(
                self.dim_out,
                self.fmap_size,
                self.proj_factor,
                self.heads,
                self.dim_head,
                dtype=jnp.float64 if f64 else self.dtype,
                name=f"block{i}",
            )(x, train=train, mask=mask)
        return x.astype(jnp.float32) if f64 else x
