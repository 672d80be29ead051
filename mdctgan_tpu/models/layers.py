"""Building-block layers (Flax, NHWC).

TPU-first notes: everything is NHWC (the TPU-native conv layout; the torch
reference is NCHW), instance norm is a stateless function (the reference uses
``InstanceNorm2d(affine=False)`` — no parameters, networks.py:26), and all
shapes are static under jit.

Reference blocks: ResnetBlock (networks.py:421-463), ConvResBlock
(networks.py:403-417), InterpolateUpsample (networks.py:375-400).
"""

from __future__ import annotations

from functools import partial
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
    convs.  Forward is XLA (it fuses the chain to kernel speed — measured,
    see ops/norm.py); the backward is the closed-form raw-moment custom VJP."""
    from mdctgan_tpu.ops.norm import instance_norm_fused

    return instance_norm_fused(x, relu=False)


def instance_norm_relu(x: Array) -> Array:
    """relu(instance_norm(x)) as one fused pass (the generator's ubiquitous
    conv->IN->ReLU chain)."""
    from mdctgan_tpu.ops.norm import instance_norm_fused

    return instance_norm_fused(x, relu=True)


def _reflect_pad_axis(x: Array, pad: int, axis: int) -> Array:
    """Reflect-pad one axis by concatenating small reversed edge slices.

    ``jnp.pad(mode="reflect")`` lowers through full-tensor ``lax.rev`` ops —
    a traced step showed two activation-sized reverses (~1.2 ms/step at
    flagship shapes) plus a 1.9 ms transpose-side ``add`` for its gradient.
    Building the pad from pad-sized slices keeps the reverses tiny."""
    lo = jax.lax.rev(jax.lax.slice_in_dim(x, 1, pad + 1, axis=axis), (axis,))
    n = x.shape[axis]
    hi = jax.lax.rev(jax.lax.slice_in_dim(x, n - pad - 1, n - 1, axis=axis), (axis,))
    return jnp.concatenate([lo, x, hi], axis=axis)


def _reflect_unpad_axis(g: Array, pad: int, axis: int) -> Array:
    """Transpose of ``_reflect_pad_axis``: slice the center and scatter-add
    the (flipped) edge gradients back onto the interior rows they mirror."""
    n = g.shape[axis] - 2 * pad
    core = jax.lax.slice_in_dim(g, pad, pad + n, axis=axis)
    lo = jax.lax.rev(jax.lax.slice_in_dim(g, 0, pad, axis=axis), (axis,))
    hi = jax.lax.rev(jax.lax.slice_in_dim(g, pad + n, 2 * pad + n, axis=axis), (axis,))
    pad_cfg = [(0, 0)] * g.ndim
    pad_cfg[axis] = (1, n - pad - 1)
    core = core + jnp.pad(lo, pad_cfg)
    pad_cfg[axis] = (n - pad - 1, 1)
    return core + jnp.pad(hi, pad_cfg)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _reflect_pad_hw(x: Array, pad: int) -> Array:
    return _reflect_pad_axis(_reflect_pad_axis(x, pad, 1), pad, 2)


def _reflect_pad_hw_fwd(x, pad):
    return _reflect_pad_hw(x, pad), None


def _reflect_pad_hw_bwd(pad, _res, g):
    return (_reflect_unpad_axis(_reflect_unpad_axis(g, pad, 2), pad, 1),)


_reflect_pad_hw.defvjp(_reflect_pad_hw_fwd, _reflect_pad_hw_bwd)


def reflect_pad(x: Array, pad: int) -> Array:
    """``nn.ReflectionPad2d(pad)`` on the two spatial axes of an NHWC tensor
    (torch semantics: the edge sample is not repeated)."""
    return _reflect_pad_hw(x, pad)


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


def auto_phases(out_features: int) -> int:
    """Column-phase count for a stride-1 conv with ``out_features`` output
    channels, chosen so phases x features stays within the MXU's 128 output
    lanes (isolated v5e A/B: p4 wins at 28 channels, p2 at 56/64, dense at
    >= 112 — tools/ab_phased_conv.py).

    DISABLED by default (returns 1): full train-step traces on v5e measured
    the isolated 1.2-1.7x per-conv wins being erased by the un-interleave
    data-formatting passes XLA must insert at the fusion boundaries — net
    +2 ms on an 82 ms step whichever site subset was enabled (see
    docs/PERFORMANCE.md "negative results").  Set ``MDCTGAN_PHASED_CONV=1``
    to re-enable for experimentation on other TPU generations."""
    import os

    if os.environ.get("MDCTGAN_PHASED_CONV", "0") != "1":
        return 1
    if out_features <= 32:
        return 4
    return 2 if out_features <= 64 else 1


class Conv(nn.Module):
    """Plain conv2d with explicit symmetric zero padding (torch-style).

    ``dtype`` is the COMPUTE dtype (params stay float32): bf16 here is the
    TPU equivalent of the reference's AMP autocast (train.py:65-70) — MXU
    runs at 2x bf16 throughput and needs no GradScaler.

    ``phases > 1`` computes the SAME conv (identical parameter tree and
    math) column-phased: ``phases`` adjacent output columns fold into output
    channels via a shifted kernel bank, raising MXU output-lane occupancy
    for the low-channel-count layers (28/56 of 128 lanes in the flagship).
    Applied only at sites where an A/B on v5e measured a win
    (tools/ab_phased_conv.py; docs/PERFORMANCE.md) and only for batches
    >= 8 (dense below — bank formatting dominates tiny batches)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    phases: int = 1
    min_batch: int = 8  # below: dense (bank formatting dominates tiny batches)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.phases > 1 and self.use_bias:
            return _PolyphaseConvInner(
                self.features, self.kernel, self.phases, self.stride,
                padding=self.padding, min_batch=self.min_batch,
                dtype=self.dtype, name="conv",
            )(x)
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
    is checkpoint-compatible with a plain Conv), computed polyphase.

    Symmetric zero padding of ``padding`` per side is applied INSIDE the
    conv op (its padding attribute — an explicit jnp.pad materializes a
    copy and breaks fusion); any reflect padding must be done by the caller
    with ``padding=0`` here.  ``min_batch`` gates the restructuring: below
    it the dense conv runs (kernel-bank formatting costs dominate tiny
    batches — same convention as ``UpsampledConv``)."""

    features: int
    kernel: int
    phases: int
    stride: int = 1
    padding: int = 0
    min_batch: int = 0
    phases_h: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, p, f, s = self.kernel, self.phases, self.features, self.stride
        pad = self.padding
        in_c = x.shape[-1]
        kernel = self.param("kernel", conv_init(), (k, k, in_c, f), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        # match flax nn.Conv's dtype promotion (bf16 x + f32 params -> f32
        # compute) so phased and dense branches are numerically identical
        dtype = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dtype)
        kern = kernel.astype(dtype)
        h_out = (x.shape[1] + 2 * pad - k) // s + 1
        w_out = (x.shape[2] + 2 * pad - k) // s + 1
        ph = self.phases_h
        if (
            ph > 1 and s == 1 and x.shape[0] >= self.min_batch
            and h_out % ph == 0 and w_out % p == 0
        ):
            # 2-D phasing: output block (di, dj) in (ph, p) reads taps offset
            # (di, dj) of a (k+ph-1, k+p-1) bank — for the same lane count
            # ph*p, splitting phases across H and W inflates the contraction
            # far less than W alone ((k+ph-1)(k+p-1)/k^2 vs (k+ph*p-1)/k):
            # for the 7x7 head, 4x8 is 2.6x vs 5.1x.  Un-interleave is one
            # depth-to-space.
            taps = [
                jnp.pad(kern, ((di, ph - 1 - di), (dj, p - 1 - dj),
                               (0, 0), (0, 0)))
                for di in range(ph) for dj in range(p)
            ]
            bank = jnp.stack(taps, axis=-2).reshape(
                k + ph - 1, k + p - 1, in_c, ph * p * f
            )
            y = jax.lax.conv_general_dilated(
                x, bank, window_strides=(ph, p),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b, hp, wp, _ = y.shape
            y = y.reshape(b, hp, wp, ph, p, f)
            y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
            y = y.reshape(b, hp * ph, wp * p, f)
        elif p > 1 and w_out >= p and x.shape[0] >= self.min_batch:
            # Shifted kernel bank: output phase j reads taps starting at
            # column j*s of a (k, k+(p-1)*s)-wide kernel; stride p*s then
            # computes p adjacent output columns as p*f MXU output lanes in
            # one pass.  Non-multiple-of-p widths round up with extra zero
            # padding and the surplus columns are cropped after; surplus
            # windows may straddle real data and padding so their values
            # are garbage — correctness rests on the crop alone, while
            # every KEPT column reads exactly the window the dense conv
            # would.  All zero padding rides the conv op's padding
            # attribute (an explicit jnp.pad materializes a copy and
            # breaks fusion, which a trace showed eating the phasing win).
            w_keep, rem = w_out, w_out % p
            extra = (p - rem) * s if rem else 0
            taps = [
                jnp.pad(kern, ((0, 0), (j * s, (p - 1 - j) * s), (0, 0), (0, 0)))
                for j in range(p)
            ]
            bank = jnp.stack(taps, axis=-2)  # (k, k+(p-1)s, C, p, f)
            bank = bank.reshape(k, k + (p - 1) * s, in_c, p * f)
            y = jax.lax.conv_general_dilated(
                x, bank, window_strides=(s, p * s),
                padding=((pad, pad), (pad, pad + extra)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b, h, wp, _ = y.shape
            y = y.reshape(b, h, wp * p, f)  # phase j is column w'*p + j
            if rem:
                y = y[:, :, :w_keep, :]
        else:
            y = jax.lax.conv_general_dilated(
                x, kern, window_strides=(s, s),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(dtype)


class PolyphaseConv(nn.Module):
    """7x7 tanh-head conv restructured for the MXU.

    The pix2pixHD output head maps ngf channels to output_nc=1
    (networks.py:243-244, 356-357): as a dense conv its single output channel
    uses 1 of the MXU's 128 output lanes (measured 1.1 TFLOP/s on v5e — 0.5%
    of peak, ~7% of the whole train step).  Folding adjacent output pixels
    into output channels via a shifted kernel bank raises lane occupancy
    with bit-identical parameters (same param tree as ``Conv`` — .pth import
    is unaffected) and the same math.

    The default is the 2-D ``phases_h x phases_w = 4x8`` block variant: at
    equal lane count it inflates the contraction 2.6x vs 1-D's 5.1x for the
    7x7 kernel (1.56x faster fwd+bwd isolated; 8x16 hits a pathological
    layout).  In round 1's graph the in-step gain was returned to XLA's
    layout assignment as new transposes in the upstream upsample backward
    (step-neutral, 82.1 vs 81.7 ms) and the default stayed 1-D; the round-2
    dilated-upsample rewrite removed those competing transposes and the 2-D
    head now wins in-step too (77.9 -> 76.3 ms scan).  Falls back (1-D,
    then dense) when the output extents don't divide by the phase counts or
    the batch is small; MDCTGAN_HEAD_PHASES ("16" or "4x8") overrides for
    A/B.
    """

    features: int
    kernel: int
    phases: int = 16
    phases_h: int = 4
    phases_w: int = 8
    min_batch_2d: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import os

        # Decide 2-D eligibility HERE (both extents must divide) so that an
        # ineligible geometry falls back to the tuned 1-D ``phases`` count,
        # not to the inner's 1-D-with-phases_w path.
        k = self.kernel
        h_out, w_out = x.shape[1] - k + 1, x.shape[2] - k + 1
        # measurement hook: MDCTGAN_HEAD_PHASES="4x8" or "16" overrides
        phases_h, phases_w, phases = self.phases_h, self.phases_w, self.phases
        env = os.environ.get("MDCTGAN_HEAD_PHASES")
        if env:
            if "x" in env:
                phases_h, phases_w = (int(v) for v in env.split("x"))
            else:
                phases_h, phases = 1, int(env)
        if (
            phases_h > 1 and x.shape[0] >= self.min_batch_2d
            and h_out % phases_h == 0 and w_out % phases_w == 0
        ):
            return _PolyphaseConvInner(
                self.features, self.kernel, phases_w,
                phases_h=phases_h, dtype=self.dtype, name="conv",
            )(x)
        return _PolyphaseConvInner(
            self.features, self.kernel, phases, dtype=self.dtype,
            name="conv",
        )(x)


_DN = ("NHWC", "HWIO", "NHWC")


def _dilated_up2_conv_raw(x: Array, kp: Array, p: int) -> Array:
    return jax.lax.conv_general_dilated(
        x, kp, (1, 1), padding=((p + 1, p + 1), (p + 1, p + 1)),
        lhs_dilation=(2, 2), dimension_numbers=_DN,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dilated_up2_conv(x: Array, kp: Array, p: int) -> Array:
    """``conv(x, kp, lhs_dilation=2, pad=p+1)`` with a hand-written backward.

    XLA's autodiff transpose of an lhs-dilated conv reverses the
    ACTIVATION-sized cotangent (traced at ~1.6 ms/step across the flagship's
    upsample sites).  Both gradients are plain convs with at most a
    KERNEL-sized flip:

    (XLA convs are cross-correlations: out[j] = sum_u in[j+u-q] K[u], so
    source pixel i reaches output j = 2i+q-u.)

      * grad_x: the transpose of "each source pixel feeds outputs 2i+q-u"
        is a stride-2 conv of the cotangent with the spatially-flipped,
        I/O-transposed kernel, symmetric padding k-p-1.
      * grad_k: grad_K[u,v,i,o] = sum_{b,m,n} x[b,m,n,i] ct[b,2m+q-u,2n+q-v,o]
        — one lhs-dilated conv contracting the batch axis (x as lhs with
        batch mapped to the feature dim, ct as the "kernel").
    """
    return _dilated_up2_conv_raw(x, kp, p)


def _dilated_up2_conv_fwd(x, kp, p):
    return _dilated_up2_conv_raw(x, kp, p), (x, kp)


def _dilated_up2_conv_bwd(p, res, ct):
    import os

    x, kp = res
    kk = kp.shape[0]  # widened kernel extent k+1
    q = p + 1
    pad = kk - 1 - q  # == k - p - 1, symmetric
    kflip = jnp.transpose(kp[::-1, ::-1], (0, 1, 3, 2))
    gx = jax.lax.conv_general_dilated(
        ct, kflip, (2, 2), padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
    )
    if os.environ.get("MDCTGAN_DILATED_VJP", "1") == "gx":
        # hybrid A/B form: keep XLA's own grad-k transpose (no activation
        # reversal lives on that path), only grad-x is hand-written
        _, vjp_k = jax.vjp(lambda kq: _dilated_up2_conv_raw(x, kq, p), kp)
        (gk,) = vjp_k(ct)
    else:
        gk = jax.lax.conv_general_dilated(
            x, ct, (1, 1), padding=((q, q), (q, q)), lhs_dilation=(2, 2),
            dimension_numbers=("CHWN", "IHWO", "HWNC"),
        )
    return gx.astype(x.dtype), gk.astype(kp.dtype)


_dilated_up2_conv.defvjp(_dilated_up2_conv_fwd, _dilated_up2_conv_bwd)


def _upsample_phase_geometry(k: int, p: int):
    """Fused-kernel geometry for folding a nearest-2x upsample into a k x k
    (pad p) conv: output phase ``di`` in {0,1}, dense tap ``u`` reads
    upsampled row 2i+di+u-p = source row i + (di+u-p)//2, so taps hitting
    the same source row merge.  Returns (smin, K): the smallest source-row
    offset and the merged kernel extent."""
    smin = min((di - p) // 2 for di in (0, 1))
    smax = max((di + k - 1 - p) // 2 for di in (0, 1))
    return smin, smax - smin + 1


class _UpsampledConvInner(nn.Module):
    """Params identical to ``Conv``'s inner nn.Conv (kernel (k,k,I,O) HWIO +
    bias) — the nearest-2x upsample is fused into the conv.

    Three equal-math forms, selected per site (``method``):
      * ``dilated`` — ONE input-dilated conv: ``conv(nearest2x(x), K) ==
        conv_general_dilated(x, K', lhs_dilation=2, pad=p+1)`` with
        ``K' = K correlated with [1,1]`` per spatial dim (size k+1).  No
        phase bank, no depth-to-space; the TPU conv emitter handles
        lhs-dilated convs natively.  THE default at every batch: the
        flagship step dropped 91.9 -> 77.8 ms (scan; docs/PERFORMANCE.md)
        and batch-1 inference 1.85 -> 1.58 ms/segment when every upsample
        site switched — isolated fwd+bwd 4.71 -> 2.79 ms at 224ch and
        4.38 -> 2.53 ms at 448ch, and the depth-to-space layout shuffles
        leave the graph entirely.
      * ``phase`` — round-1's polyphase kernel bank + depth-to-space; now
        slower at every measured site in-graph, kept selectable for
        re-measurement on other TPU generations.
      * ``dense`` — materialize the 2x tensor (the naive form; kept as the
        numerics oracle and A/B baseline).
    ``auto`` resolves via the MDCTGAN_UPSAMPLE_METHOD A/B hook, else to
    dilated; an explicitly-constructed method ignores the env var.
    """

    features: int
    kernel: int
    padding: int
    method: str = "auto"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import os

        k, p, f = self.kernel, self.padding, self.features
        assert k % 2 == 1, "odd kernels only (equal phase counts)"
        in_c = x.shape[-1]
        kernel = self.param("kernel", conv_init(), (k, k, in_c, f), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        dtype = self.dtype or x.dtype
        kern = kernel.astype(dtype)
        x = x.astype(dtype)
        method = self.method
        if method == "auto":
            # the A/B hook only resolves "auto" — an explicitly-constructed
            # method is never silently overridden by a leftover env var
            method = os.environ.get("MDCTGAN_UPSAMPLE_METHOD", "auto")
        if method == "auto":
            # dilated wins at every measured batch (train 91.9->77.8 ms/step;
            # batch-1 inference 1.85->1.58 ms/segment)
            method = "dilated"
        if method == "dense":
            xu = upsample_nearest_2x(x)
            xu = jnp.pad(xu, ((0, 0), (p, p), (p, p), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xu, kern, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(dtype)
        if method == "dilated":
            # widen in f32 from the stored param, cast once: K' entries are
            # 2-tap sums and bf16(f32+f32) loses less than bf16+bf16
            kp = (jnp.pad(kernel, ((0, 1), (0, 0), (0, 0), (0, 0)))
                  + jnp.pad(kernel, ((1, 0), (0, 0), (0, 0), (0, 0))))
            kp = (jnp.pad(kp, ((0, 0), (0, 1), (0, 0), (0, 0)))
                  + jnp.pad(kp, ((0, 0), (1, 0), (0, 0), (0, 0)))).astype(dtype)
            if os.environ.get("MDCTGAN_DILATED_VJP", "1") in ("1", "gx"):
                y = _dilated_up2_conv(x, kp, p)
            else:
                y = jax.lax.conv_general_dilated(
                    x, kp, (1, 1), padding=((p + 1, p + 1), (p + 1, p + 1)),
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return y + bias.astype(dtype)
        assert method == "phase", f"unknown upsample method {method!r}"
        smin, kk = _upsample_phase_geometry(k, p)

        # Merge dense taps that hit the same source pixel.  The merge is a
        # 0/1 bucketing, so build it with slice-adds (one fused elementwise
        # pass) — an einsum against 0/1 bucket matrices lowers to badly-
        # shaped tiny dot_generals that dominate small-batch inference.
        def merge(kr, di: int, axis: int):
            buckets = [[] for _ in range(kk)]
            for u in range(k):
                buckets[(di + u - p) // 2 - smin].append(
                    jax.lax.index_in_dim(kr, u, axis, keepdims=False)
                )
            zero = jnp.zeros_like(jax.lax.index_in_dim(kr, 0, axis, False))
            cols = [sum(b[1:], b[0]) if b else zero for b in buckets]
            return jnp.stack(cols, axis=axis)

        # 4 phase kernels (K,K,I,O) -> one bank (K,K,I,4O), phase (di,dj)
        # at channel block di*2+dj.
        phases = [
            merge(merge(kern, di, 0), dj, 1) for di in (0, 1) for dj in (0, 1)
        ]
        bank = jnp.stack(phases, axis=-2).reshape(kk, kk, in_c, 4 * f)
        b, h, w, _ = x.shape
        pt = -smin
        n_h = h + p - (k - 1) // 2   # per-phase output rows
        n_w = w + p - (k - 1) // 2
        pb_h = n_h + (kk - 1 + smin) - h   # window end pad
        pb_w = n_w + (kk - 1 + smin) - w
        xp = jnp.pad(x, ((0, 0), (pt, pb_h), (pt, pb_w), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, bank, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # depth-to-space: channel block (di, dj) is output pixel (2i+di, 2j+dj)
        y = y.reshape(b, n_h, n_w, 2, 2, f)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * n_h, 2 * n_w, f)
        return y + bias.astype(dtype)


class UpsampledConv(nn.Module):
    """nearest-2x upsample + k x k conv, fused by polyphase decomposition.

    ``conv(upsample_nearest_2x(x))`` reads each source pixel k^2 times from a
    4x-size HBM intermediate and runs the conv at the upsampled resolution.
    Merging the dense taps that hit the same source pixel yields 4 phase
    kernels applied to the ORIGINAL resolution: for the 5x5 conv this is 36%
    fewer FLOPs (4 x 4x4 taps vs 25 on 4x area), the 2x-upsampled tensor is
    never materialized, and the MXU sees 4x the output channels.  Same math
    and the same parameter tree as ``Conv`` (checkpoint import unaffected).
    """

    features: int
    kernel: int
    padding: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _UpsampledConvInner(
            self.features, self.kernel, self.padding,
            dtype=self.dtype, name="conv",
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
        # NOT phased: measured in-graph neutral (the isolated 1.7x conv win
        # is offset by the un-interleave pass; see docs/PERFORMANCE.md).
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
        # conv1 is strided — phasing measured neutral there; the stride-1
        # follow-ups benefit when their channel count underfills the MXU.
        p = auto_phases(self.out_features)
        x = Conv(self.in_features, self.kernel, self.stride, self.padding,
                 dtype=self.dtype, name="conv1")(x)
        res = Conv(self.out_features, 3, 1, 1, phases=p, dtype=self.dtype,
                   name="conv_res")(x)
        x = Conv(self.out_features, 5, 1, 2, phases=p, dtype=self.dtype,
                 name="conv2")(x)
        return x + res


class InterpolateUpsample(nn.Module):
    """Nearest-2x upsample + conv pair with conv residual (networks.py:375-400).
    conv1 is 5x5 pad 1 (shrinks by 2), conv2 is 3x3 pad 2 (grows by 2).

    The upsample is fused into conv1 and conv_res via ``UpsampledConv``
    (polyphase decomposition): the 2x-upsampled tensor is never
    materialized, identical math and parameters."""

    in_features: int
    out_features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = UpsampledConv(self.out_features, 3, 1, dtype=self.dtype,
                            name="conv_res")(x)
        x = UpsampledConv(self.out_features, 5, 1, dtype=self.dtype,
                          name="conv1")(x)
        x = Conv(self.out_features, 3, 1, 2,
                 phases=auto_phases(self.out_features), dtype=self.dtype,
                 name="conv2")(x)
        return x + res
