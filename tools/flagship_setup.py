"""Shared flagship train-step construction for the perf tools
(tools/ab_fused_step.py, tools/tpu_profile.py).

bench.py keeps its own self-contained copy on purpose — it is the round
driver's entry point and should not depend on tools/."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from mdctgan_tpu.configs import (  # noqa: E402
    flagship_discriminator,
    flagship_generator,
    flagship_spectral,
)
from mdctgan_tpu.train.state import create_train_state  # noqa: E402


def flagship_state(batch_size: int):
    """(cfg, gen, disc, g_tx, d_tx, state, mkbatch, key) for the flagship
    bf16 config; ``mkbatch()`` draws a fresh random waveform batch."""
    cfg = flagship_spectral()
    gen = flagship_generator(dtype=jnp.bfloat16)
    disc = flagship_discriminator(dtype=jnp.bfloat16)
    g_tx = optax.adam(2e-4, b1=0.5)
    d_tx = optax.adam(2e-4, b1=0.5)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=2, d_in_channels=3,
    )
    rng = np.random.default_rng(0)

    def mkbatch():
        return {
            "lr_audio": jnp.asarray(
                0.1 * rng.standard_normal((batch_size, cfg.segment_length)),
                jnp.float32,
            ),
            "hr_audio": jnp.asarray(
                0.1 * rng.standard_normal((batch_size, cfg.segment_length)),
                jnp.float32,
            ),
        }

    return cfg, gen, disc, g_tx, d_tx, state, mkbatch, jax.random.PRNGKey(1)
