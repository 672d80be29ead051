"""A/B: MXU-aligned channel padding (ngf 56 -> 64) on the flagship step.

Hypothesis under test (VERDICT r2 #2): pix2pixHD's channel widths
(56/112/224/448/896 in the flagship LocalEnhancer) underfill the MXU's
128-lane dimension (~48% measured fill), and zero-padding them up to the
next multiple of 64 (64/128/256/512/1024) — exact math: padded input
channels get zero weights, padded outputs are sliced off — might raise the
fill enough to beat the +14% contraction-FLOP cost.

Counter-hypothesis (TPU layout model): XLA pads the channel (minor-most,
lane) dimension of every NHWC tensor to 128 in memory AND in the conv
contraction regardless, so widths 56 and 64 run in the SAME number of lane
tiles and the padding only re-labels wasted lanes as useful FLOPs without
changing time; 448->512 and 896->1024 ADD a real lane tile.

For timing, values are irrelevant: a LocalEnhancer built with ngf=64 is
shape-identical to the zero-padded ngf=56 model, so this times the flagship
G+D train step at both widths with bench.py's carried-dependency scan.

Usage (real TPU): python tools/ab_pad_channels.py [--batch 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")
from bench import train_step_scan_ms  # noqa: E402

from mdctgan_tpu.configs import (  # noqa: E402
    flagship_discriminator,
    flagship_generator,
    flagship_spectral,
)
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.train.state import create_train_state
from mdctgan_tpu.train.step import build_train_step


def time_step(ngf: int, batch_size: int) -> float:
    rng = np.random.default_rng(0)
    cfg = flagship_spectral()
    tf_ = SpectralTransform(cfg)
    gen = dataclasses.replace(flagship_generator(dtype=jnp.bfloat16), ngf=ngf)
    disc = flagship_discriminator(dtype=jnp.bfloat16)
    g_tx = optax.adam(2e-4, b1=0.5)
    d_tx = optax.adam(2e-4, b1=0.5)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=2, d_in_channels=3,
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(state.g_params))
    step = build_train_step(gen, disc, tf_, g_tx, d_tx, donate=False)
    batch = {
        "lr_audio": jnp.asarray(
            0.1 * rng.standard_normal((batch_size, cfg.segment_length)),
            jnp.float32),
        "hr_audio": jnp.asarray(
            0.1 * rng.standard_normal((batch_size, cfg.segment_length)),
            jnp.float32),
    }
    ms = train_step_scan_ms(step, state, batch, jax.random.PRNGKey(1))
    print(f"[ab_pad] ngf={ngf}: G params {n_params / 1e6:.1f}M, "
          f"step {ms:.2f} ms (batch {batch_size})", flush=True)
    return ms


def main() -> None:
    from mdctgan_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache("/tmp/mdctgan_jax_cache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--ngf", type=int, nargs="+", default=[56, 64])
    args = ap.parse_args()

    times = {ngf: time_step(ngf, args.batch) for ngf in args.ngf}
    base = times[args.ngf[0]]
    for ngf, ms in times.items():
        print(f"[ab_pad] ngf={ngf}: {ms:.2f} ms  "
              f"({ms / base:.3f}x vs ngf={args.ngf[0]})", flush=True)


if __name__ == "__main__":
    main()
