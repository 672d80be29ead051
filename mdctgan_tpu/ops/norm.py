"""Instance norm (+ optional fused ReLU) with a closed-form custom backward.

Reference semantics: InstanceNorm2d(affine=False) (networks.py:26), the
generator's ubiquitous conv -> IN -> ReLU chain.

Forward is plain XLA — a measured A/B on v5e showed XLA already fuses the
chain to the same speed as a hand-written Pallas kernel (G fwd 30.8 ms
either way), and at flagship activation sizes a per-sample VMEM-resident
kernel doesn't fit anyway; the full negative-result writeup lives in
docs/PERFORMANCE.md ("Negative results").  The round-1 Pallas fwd/bwd
kernels were therefore removed (git history: mdctgan_tpu/ops/pallas_norm.py)
rather than shipped dark.

The backward IS custom: XLA autodiff of the IN formula re-derives mean/var
gradients through ~4 full passes over (x, g); the closed form

    dx = inv * (g' - mean(g') - y * mean(g' * y)),   g' = g * 1[y > 0]

needs one fused reduction pass plus one elementwise pass (full-res
generator IN: 2.43 ms -> HBM-bound; step busy time 81.2 -> 79.7 ms).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-5


def _jax_instance_norm_stats(x: Array, relu: bool):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    centered = x - mean.astype(x.dtype)
    var = jnp.mean(
        jnp.square(centered), axis=(1, 2), keepdims=True, dtype=jnp.float32
    )
    inv = jax.lax.rsqrt(var + _EPS)
    out = centered * inv.astype(x.dtype)
    return (jnp.maximum(out, 0) if relu else out), mean, inv


def _jax_instance_norm(x: Array, relu: bool) -> Array:
    return _jax_instance_norm_stats(x, relu)[0]


def _xla_instance_norm_bwd(x: Array, mean: Array, inv: Array, g: Array,
                           relu: bool) -> Array:
    """Hand-derived IN backward via raw moments (see module docstring)."""
    n = x.shape[1] * x.shape[2]
    centered = x - mean.astype(x.dtype)  # same compute-dtype arithmetic as fwd
    gp = jnp.where(centered > 0, g, jnp.zeros_like(g)) if relu else g
    gp32 = gp.astype(jnp.float32)
    c32 = centered.astype(jnp.float32)
    m1 = jnp.mean(gp32, axis=(1, 2), keepdims=True)
    mgy = inv * jnp.sum(gp32 * c32, axis=(1, 2), keepdims=True) * (1.0 / n)
    dx = inv * (gp32 - m1 - (c32 * inv) * mgy)
    return dx.astype(x.dtype)


def _make(relu: bool):
    @jax.custom_vjp
    def fn(x: Array) -> Array:
        return _jax_instance_norm(x, relu)

    def fwd(x: Array):
        out, mean, inv = _jax_instance_norm_stats(x, relu)
        return out, (x, mean, inv)

    def bwd(res, g: Array):
        x, mean, inv = res
        return (_xla_instance_norm_bwd(x, mean, inv, g, relu),)

    fn.defvjp(fwd, bwd)
    return fn


_fused_plain = _make(relu=False)
_fused_relu = _make(relu=True)


def instance_norm_fused(x: Array, relu: bool = False) -> Array:
    """relu(instance_norm(x)) (or plain IN) with the closed-form backward."""
    return _fused_relu(x) if relu else _fused_plain(x)


# ---------------------------------------------------------------------------
# Train-mode BatchNorm2d with a closed-form custom backward.
#
# Twin of torch BatchNorm2d training statistics (the attention stack's BN,
# reference networks.py:341-343 via bottleneck_transformer_pytorch): per-
# channel mean/var over (B, H, W) — optionally restricted to the real rows
# of a padded tail batch via ``mask`` — then y = (x - mean)*rsqrt(var+eps)*
# scale + bias.  Forward keeps the TWO-PASS variance E[(x-mean)^2] (the
# one-pass raw-moment form loses ~3 decimal digits to cancellation in f32;
# measured in tools/flagship_grad_truth.py, see models/attention.py).
#
# The backward is the closed form (same move as the instance norm above):
# XLA autodiff of the two-pass formula spends ~4 passes over (x, g) per BN
# re-deriving the mean/var chains; the closed form
#
#     dx = scale*inv * (g - mj/n*sum(g) - xh * mj/n*sum(g*xh))
#     dscale = sum(g*xh),   dbias = sum(g)
#
# (mj the per-row mask weight, sums over ALL rows — padded rows' outputs
# also consume the masked statistics) needs one fused reduction pass plus
# one elementwise pass.  Values/gradients are the same math in a different
# association order (tests/test_norm.py compares against XLA autodiff).
# ---------------------------------------------------------------------------


def _bn_apply(x: Array, scale: Array, bias: Array, mean: Array, var: Array):
    inv = jax.lax.rsqrt(var + _EPS)
    y = (x - mean) * (inv * scale) + bias
    return y, inv


@jax.custom_vjp
def _bn_train(x: Array, scale: Array, bias: Array):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x - mean), axis=(0, 1, 2))
    y, _ = _bn_apply(x, scale, bias, mean, var)
    return y, mean, var


def _bn_train_fwd(x, scale, bias):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x - mean), axis=(0, 1, 2))
    y, inv = _bn_apply(x, scale, bias, mean, var)
    return (y, mean, var), (x, mean, inv, scale)


def _bn_train_bwd(res, cts):
    x, mean, inv, scale = res
    gy, gmean, gvar = cts  # gmean/gvar: broadcast-zero in the train step
    rn = 1.0 / (x.shape[0] * x.shape[1] * x.shape[2])
    xh = (x - mean) * inv
    sum_g = jnp.sum(gy, axis=(0, 1, 2))
    sum_gxh = jnp.sum(gy * xh, axis=(0, 1, 2))
    dx = (scale * inv) * (gy - rn * sum_g - xh * (rn * sum_gxh))
    # mean/var-output cotangents (XLA folds these away when gmean/gvar are
    # the literal zeros the non-differentiated running-stat update yields):
    dx = dx + rn * gmean + (2.0 * rn) * gvar * (x - mean)
    # cotangent dtypes must match the primals (x may be f64 under the
    # MDCTGAN_ATTN_F64 experiment while scale/bias params stay f32)
    return dx, sum_gxh.astype(scale.dtype), sum_g.astype(scale.dtype)


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


@jax.custom_vjp
def _bn_train_masked(x: Array, scale: Array, bias: Array, mask: Array):
    m = mask.reshape(-1, 1, 1, 1)
    n = jnp.sum(m) * (x.shape[1] * x.shape[2])
    mean = jnp.sum(x * m, axis=(0, 1, 2)) / n
    var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1, 2)) / n
    y, _ = _bn_apply(x, scale, bias, mean, var)
    return y, mean, var


def _bn_train_masked_fwd(x, scale, bias, mask):
    m = mask.reshape(-1, 1, 1, 1)
    n = jnp.sum(m) * (x.shape[1] * x.shape[2])
    mean = jnp.sum(x * m, axis=(0, 1, 2)) / n
    var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1, 2)) / n
    y, inv = _bn_apply(x, scale, bias, mean, var)
    return (y, mean, var), (x, mean, inv, scale, m, n)


def _bn_train_masked_bwd(res, cts):
    x, mean, inv, scale, m, n = res
    gy, gmean, gvar = cts
    rn = 1.0 / n
    xh = (x - mean) * inv
    # outputs on every row (masked or not) consume the masked statistics,
    # so the stat-sensitivity sums run over ALL rows; only the per-element
    # stat derivative carries the mask weight m_j.
    sum_g = jnp.sum(gy, axis=(0, 1, 2))
    sum_gxh = jnp.sum(gy * xh, axis=(0, 1, 2))
    dx = (scale * inv) * (gy - (m * rn) * sum_g - xh * ((m * rn) * sum_gxh))
    dx = dx + (m * rn) * gmean + (2.0 * rn) * gvar * (m * (x - mean))
    # mask is 0/1 iteration bookkeeping, never differentiated; scale/bias
    # cotangents cast to the primal dtype (see _bn_train_bwd)
    return (dx, sum_gxh.astype(scale.dtype), sum_g.astype(scale.dtype),
            jnp.zeros((m.shape[0],), m.dtype))


_bn_train_masked.defvjp(_bn_train_masked_fwd, _bn_train_masked_bwd)


def batch_norm2d_train(
    x: Array, scale: Array, bias: Array, mask: Optional[Array] = None
) -> Tuple[Array, Array, Array]:
    """Train-mode BatchNorm2d (NHWC, f32) with the closed-form backward.

    Returns ``(y, batch_mean, batch_var)`` — the (biased) batch statistics
    feed the caller's running-stat update.  ``mask`` (B,) 0/1 restricts the
    statistics to real rows (padded tail batches; see models/attention.py).
    """
    if mask is None:
        return _bn_train(x, scale, bias)
    return _bn_train_masked(x, scale, bias, mask.astype(x.dtype))
