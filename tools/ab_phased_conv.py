"""A/B: dense conv vs column-phased conv on the flagship's hot shapes.

The generator's highest-resolution convs have 28/56 output channels — they
fill only 28/128 or 56/128 of the MXU's output-lane dimension (see
docs/PERFORMANCE.md "Why convs sit at ~50% MXU").  Folding ``p`` adjacent
output COLUMNS into channels via a shifted kernel bank (the PolyphaseConv
trick, models/layers.py) raises lane occupancy p-fold at the cost of a
(k+(p-1)*s)/k-wider contraction.  This tool measures, per shape, the device
time of dense vs phased, forward and forward+backward, so the phase counts
shipped in the model are evidence, not guesses.

Usage:  python tools/ab_phased_conv.py [--shapes all|NAME,...]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import device_time_scan  # noqa: E402


def dense_conv(x, kern, stride):
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def phased_conv(x, kern, stride, phases):
    """Column-phased conv: output phase j in [0,p) reads input columns
    starting at j*stride; pad the kernel into a (k_h, k_w+(p-1)*s) bank with
    p*f output channels and stride (s, p*s); un-interleave columns after."""
    k_h, k_w, in_c, f = kern.shape
    p, s = phases, stride
    taps = [
        jnp.pad(kern, ((0, 0), (j * s, (p - 1 - j) * s), (0, 0), (0, 0)))
        for j in range(p)
    ]
    bank = jnp.stack(taps, axis=-2).reshape(k_h, k_w + (p - 1) * s, in_c, p * f)
    y = jax.lax.conv_general_dilated(
        x, bank, window_strides=(s, p * s), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, h, wp, _ = y.shape
    return y.reshape(b, h, wp, p, f).reshape(b, h, wp * p, f)


# (name, input NHWC, k, stride, out_c) — all batch-20 bf16 flagship shapes,
# inputs already padded as the model pads them (reflect/zero outside VALID).
SHAPES = {
    # local enhancer stem: 7x7 2->28 @ full res (pad 3)
    "stem7_full_2to28": ((20, 134, 262, 2), 7, 1, 28),
    # local_up InterpolateUpsample conv2: 3x3 28->28 @ full res (pad 2)
    "upconv3_full_28to28": ((20, 130, 258, 28), 3, 1, 28),
    # ConvResBlock conv1 @ full res: 3x3 s2 28->28 (pad 1)
    "down3s2_full_28to28": ((20, 130, 258, 28), 3, 2, 28),
    # ConvResBlock conv2 @ half res: 5x5 28->56 (pad 2)
    "conv5_half_28to56": ((20, 68, 132, 28), 5, 1, 56),
    # ConvResBlock conv_res @ half res: 3x3 28->56 (pad 1)
    "conv3_half_28to56": ((20, 66, 130, 28), 3, 1, 56),
    # local resblock convs @ half res: 3x3 56->56 (pad 1)
    "res3_half_56to56": ((20, 66, 130, 56), 3, 1, 56),
    # global stem: 7x7 2->56 @ half res (pad 3)
    "stem7_half_2to56": ((20, 70, 134, 2), 7, 1, 56),
    # global down0 conv1 @ half res: 3x3 s2 56->56
    "down3s2_half_56to56": ((20, 66, 130, 56), 3, 2, 56),
    # global res blocks @ /16 res: 3x3 448->448 (lane-full; control)
    "res3_d3_448to448": ((20, 10, 18, 448), 3, 1, 448),
    # D scale-0 first conv: 4x4 s2 3->64 @ full res, batch 2x20 (fake+real)
    "d0_conv4s2_3to64": ((40, 130, 258, 3), 4, 2, 64),
    # D scale-0 second conv: 4x4 s2 64->128
    "d1_conv4s2_64to128": ((40, 66, 130, 64), 4, 2, 128),
}


def run_shape(name, spec, phase_list):
    (shape, k, s, f) = spec
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    kern = jnp.asarray(0.02 * rng.standard_normal((k, k, shape[-1], f)),
                       jnp.bfloat16)
    w_out = (shape[2] - k) // s + 1

    def report(tag, fwd_fn):
        fwd = jax.jit(lambda xx: fwd_fn(xx, kern))
        t_f = device_time_scan(fwd, x, n_lo=4, n_hi=54, reps=4)

        def loss(xx, kk):
            return jnp.sum(fwd_fn(xx, kk).astype(jnp.float32) ** 2)

        # full training backward: grads wrt BOTH input and kernel
        grad = jax.jit(lambda xx, kk: jax.grad(loss, argnums=(0, 1))(xx, kk))
        t_b = device_time_scan(lambda xx: grad(xx, kern), x, n_lo=4, n_hi=54,
                               reps=4)
        print(f"  {tag:14s} fwd {t_f:7.3f} ms   fwd+bwd(x) {t_b:7.3f} ms",
              flush=True)
        return t_f, t_b

    print(f"{name}: in{shape} k{k} s{s} -> {f}ch (w_out {w_out})", flush=True)
    base = report("dense", lambda xx, kk: dense_conv(xx, kk, s))
    for p in phase_list:
        if w_out % p:
            continue
        tf_, tb = report(f"phased p={p}",
                         lambda xx, kk: phased_conv(xx, kk, s, p))
        print(f"    -> p={p}: fwd {base[0]/tf_:.2f}x, bwd {base[1]/tb:.2f}x",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="all")
    ap.add_argument("--phases", default="2,4")
    args = ap.parse_args()
    names = SHAPES if args.shapes == "all" else args.shapes.split(",")
    phases = [int(p) for p in args.phases.split(",")]
    print(f"devices: {jax.devices()}", flush=True)
    # correctness spot-check on one shape
    (shape, k, s, f) = SHAPES["res3_half_56to56"]
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2,) + shape[1:]), jnp.float32)
    kern = jnp.asarray(np.random.default_rng(2).standard_normal(
        (k, k, shape[-1], f)) * 0.02, jnp.float32)
    ref = dense_conv(x, kern, s)
    for p in phases:
        got = phased_conv(x, kern, s, p)
        err = float(jnp.max(jnp.abs(ref - got)))
        assert err < 1e-4, (p, err)
    print("correctness ok", flush=True)
    for name in names:
        run_shape(name, SHAPES[name], phases)


def phased2d_conv(x, kern, ph, pw):
    """2-D phased conv (stride 1): output block (di, dj) in (ph, pw) reads
    taps offset (di, dj) of a (k+ph-1, k+pw-1) kernel bank; un-interleave is
    a depth-to-space."""
    k_h, k_w, in_c, f = kern.shape
    taps = [
        jnp.pad(kern, ((di, ph - 1 - di), (dj, pw - 1 - dj), (0, 0), (0, 0)))
        for di in range(ph) for dj in range(pw)
    ]
    bank = jnp.stack(taps, axis=-2).reshape(
        k_h + ph - 1, k_w + pw - 1, in_c, ph * pw * f
    )
    y = jax.lax.conv_general_dilated(
        x, bank, window_strides=(ph, pw), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, hp, wp, _ = y.shape
    y = y.reshape(b, hp, wp, ph, pw, f)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, hp * ph, wp * pw, f)
    return y


def run_head_ab():
    """Head conv: 7x7 56->1 @ full res (reflect pad 3 outside)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((20, 134, 262, 56)), jnp.bfloat16)
    kern = jnp.asarray(0.02 * rng.standard_normal((7, 7, 56, 1)), jnp.bfloat16)

    # correctness
    xs = x[:2].astype(jnp.float32)
    ks = kern.astype(jnp.float32)
    ref = dense_conv(xs, ks, 1)
    for (ph, pw) in [(2, 2), (4, 4), (8, 8), (2, 8), (4, 8), (8, 16)]:
        got = phased2d_conv(xs, ks, ph, pw)
        err = float(jnp.max(jnp.abs(ref - got)))
        assert err < 1e-4, ((ph, pw), err)
    print("head 2d correctness ok", flush=True)

    def report(tag, fwd_fn):
        fwd = jax.jit(lambda xx: fwd_fn(xx, kern))
        t_f = device_time_scan(fwd, x, n_lo=4, n_hi=54, reps=4)

        def loss(xx, kk):
            return jnp.sum(fwd_fn(xx, kk).astype(jnp.float32) ** 2)

        grad = jax.jit(lambda xx, kk: jax.grad(loss, argnums=(0, 1))(xx, kk))
        t_b = device_time_scan(lambda xx: grad(xx, kern), x, n_lo=4, n_hi=54,
                               reps=4)
        print(f"  {tag:16s} fwd {t_f:7.3f} ms   fwd+bwd {t_b:7.3f} ms",
              flush=True)

    report("1d p=16", lambda xx, kk: phased_conv(xx, kk, 1, 16))
    for (ph, pw) in [(2, 8), (4, 4), (4, 8), (8, 8), (8, 16)]:
        report(f"2d {ph}x{pw}", lambda xx, kk: phased2d_conv(xx, kk, ph, pw))


if __name__ == "__main__":
    if "--head" in sys.argv:
        run_head_ab()
    else:
        main()
