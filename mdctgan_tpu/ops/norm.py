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
