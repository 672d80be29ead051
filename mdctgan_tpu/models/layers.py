"""Building-block layers (Flax, NHWC).

TPU-first notes: everything is NHWC (the TPU-native conv layout; the torch
reference is NCHW), instance norm is a stateless function (the reference uses
``InstanceNorm2d(affine=False)`` — no parameters, networks.py:26), and all
shapes are static under jit.

Reference blocks: ResnetBlock (networks.py:421-463), ConvResBlock
(networks.py:403-417), InterpolateUpsample (networks.py:375-400).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """InstanceNorm2d(affine=False): normalize each (sample, channel) over HW.

    Statistics accumulate in float32 (matching torch AMP, which keeps norm
    math in fp32) but the activation KEEPS its compute dtype — under the bf16
    policy this halves the HBM traffic of the norm/relu/pad chain between
    convs, which dominates the generator's runtime (the model is
    bandwidth-bound, not MXU-bound).  On TPU this dispatches to the fused
    single-pass Pallas kernel (ops/pallas_norm.py); elsewhere it runs the
    identical XLA formula with centered two-pass variance."""
    from mdctgan_tpu.ops.pallas_norm import instance_norm_fused

    return instance_norm_fused(x, relu=False)


def instance_norm_relu(x: Array) -> Array:
    """relu(instance_norm(x)) as one fused pass (the generator's ubiquitous
    conv->IN->ReLU chain)."""
    from mdctgan_tpu.ops.pallas_norm import instance_norm_fused

    return instance_norm_fused(x, relu=True)


def reflect_pad(x: Array, pad: int) -> Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def leaky_relu(x: Array, slope: float = 0.2) -> Array:
    return jnp.where(x >= 0, x, slope * x)


def avg_pool_3x3_s2(x: Array) -> Array:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False), the pyramid
    downsampler used by both G and D (networks.py:249-250, 525-526)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return sum_ / count


def upsample_nearest_2x(x: Array) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def conv_init() -> Callable:
    """N(0, 0.02) conv-weight init, matching weights_init (networks.py:13-16)."""
    return nn.initializers.normal(stddev=0.02)


class Conv(nn.Module):
    """Plain conv2d with explicit symmetric zero padding (torch-style).

    ``dtype`` is the COMPUTE dtype (params stay float32): bf16 here is the
    TPU equivalent of the reference's AMP autocast (train.py:65-70) — MXU
    runs at 2x bf16 throughput and needs no GradScaler."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            kernel_init=conv_init(),
            dtype=self.dtype,
            name="conv",
        )(x)


class _PolyphaseConvInner(nn.Module):
    """Conv kernel params identical to flax ``nn.Conv`` (so this child scope
    is checkpoint-compatible with a plain Conv), computed polyphase."""

    features: int
    kernel: int
    phases: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, p, f = self.kernel, self.phases, self.features
        in_c = x.shape[-1]
        kernel = self.param("kernel", conv_init(), (k, k, in_c, f), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kern = kernel.astype(dtype)
        w_out = x.shape[2] - (k - 1)
        if p > 1 and w_out % p == 0:
            # Shifted kernel bank: output phase j reads taps [j, j+k) of a
            # (k, k+p-1)-wide kernel; stride p then computes p adjacent
            # output columns as p*f MXU output lanes in one pass.
            taps = [
                jnp.pad(kern, ((0, 0), (j, p - 1 - j), (0, 0), (0, 0)))
                for j in range(p)
            ]
            bank = jnp.stack(taps, axis=-2)  # (k, k+p-1, C, p, f)
            bank = bank.reshape(k, k + p - 1, in_c, p * f)
            y = jax.lax.conv_general_dilated(
                x, bank, window_strides=(1, p), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b, h, wp, _ = y.shape
            y = y.reshape(b, h, wp * p, f)  # phase j is column w'*p + j
        else:
            y = jax.lax.conv_general_dilated(
                x, kern, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(dtype)


class PolyphaseConv(nn.Module):
    """7x7 tanh-head conv restructured for the MXU.

    The pix2pixHD output head maps ngf channels to output_nc=1
    (networks.py:243-244, 356-357): as a dense conv its single output channel
    uses 1 of the MXU's 128 output lanes (measured 1.1 TFLOP/s on v5e — 0.5%
    of peak, ~7% of the whole train step).  Folding ``phases`` adjacent
    output columns into output channels via a shifted kernel bank + stride-
    ``phases`` conv raises lane occupancy ``phases``-fold with bit-identical
    parameters (same param tree as ``Conv`` — .pth import is unaffected) and
    the same math.  Falls back to the dense conv when the output width isn't
    divisible by ``phases``.
    """

    features: int
    kernel: int
    phases: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _PolyphaseConvInner(
            self.features, self.kernel, self.phases, dtype=self.dtype,
            name="conv",
        )(x)


class ConvTransposed(nn.Module):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) equivalent:
    doubles H and W."""

    features: int
    kernel: int = 3
    stride: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch output size: (H-1)*s - 2*p + k + op; for k3 s2 p1 op1 -> 2H.
        # lax.conv_transpose with padding ((lo, hi)) where lo = k-1-p,
        # hi = k-1-p+op reproduces it.
        k, s = self.kernel, self.stride
        p, op = 1, 1
        pad = (k - 1 - p, k - 1 - p + op)
        y = nn.ConvTranspose(
            self.features,
            (k, k),
            strides=(s, s),
            padding=(pad, pad),
            use_bias=True,
            kernel_init=conv_init(),
            dtype=self.dtype,
            transpose_kernel=True,
            name="conv",
        )(x)
        return y


class ResnetBlock(nn.Module):
    """Reflect-padded 3x3 conv resblock (networks.py:421-463):
    x + IN(conv(relu(IN(conv(pad(x)))))) with affine-free instance norm."""

    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = reflect_pad(x, 1)
        h = Conv(self.dim, 3, dtype=self.dtype, name="conv1")(h)
        h = instance_norm_relu(h)
        h = reflect_pad(h, 1)
        h = Conv(self.dim, 3, dtype=self.dtype, name="conv2")(h)
        h = instance_norm(h)
        return x + h


class ConvResBlock(nn.Module):
    """Downsample block (networks.py:403-417): strided conv -> {5x5 conv,
    3x3 res conv} -> sum."""

    in_features: int
    out_features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv(self.in_features, self.kernel, self.stride, self.padding,
                 dtype=self.dtype, name="conv1")(x)
        res = Conv(self.out_features, 3, 1, 1, dtype=self.dtype, name="conv_res")(x)
        x = Conv(self.out_features, 5, 1, 2, dtype=self.dtype, name="conv2")(x)
        return x + res


class InterpolateUpsample(nn.Module):
    """Nearest-2x upsample + conv pair with conv residual (networks.py:375-400).
    conv1 is 5x5 pad 1 (shrinks by 2), conv2 is 3x3 pad 2 (grows by 2)."""

    in_features: int
    out_features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample_nearest_2x(x)
        res = Conv(self.out_features, 3, 1, 1, dtype=self.dtype, name="conv_res")(x)
        x = Conv(self.out_features, 5, 1, 1, dtype=self.dtype, name="conv1")(x)
        x = Conv(self.out_features, 3, 1, 2, dtype=self.dtype, name="conv2")(x)
        return x + res
