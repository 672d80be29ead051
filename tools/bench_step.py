"""Flagship G+D train-step timing only (subset of bench.py, for perf A/Bs).

Usage: python tools/bench_step.py [--batch 20]
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    from mdctgan_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache("/tmp/mdctgan_jax_cache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cfg = flagship_spectral()
    tf_ = SpectralTransform(cfg)
    gen = flagship_generator(dtype=jnp.bfloat16)
    disc = flagship_discriminator(dtype=jnp.bfloat16)
    g_tx = optax.adam(2e-4, b1=0.5)
    d_tx = optax.adam(2e-4, b1=0.5)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=2, d_in_channels=3,
    )
    step = build_train_step(gen, disc, tf_, g_tx, d_tx, donate=False)
    bsz = args.batch
    batch = {
        "lr_audio": jnp.asarray(
            0.1 * rng.standard_normal((bsz, cfg.segment_length)), jnp.float32
        ),
        "hr_audio": jnp.asarray(
            0.1 * rng.standard_normal((bsz, cfg.segment_length)), jnp.float32
        ),
    }
    key = jax.random.PRNGKey(1)
    step_ms = train_step_scan_ms(step, state, batch, key)
    print(
        f"[bench] flagship G+D train step (batch {bsz}, bf16): {step_ms:.2f} ms"
        f" = {1e3 / step_ms:.2f} steps/s = {bsz * 1e3 / step_ms:.1f}"
        f" samples/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    main()
