#!/usr/bin/env python
"""Train-step-level A/B of the fused Pallas MDCT path vs the XLA path on the
real TPU (VERDICT r1 item 3): builds the flagship G+D step twice — once with
SpectralTransform(use_fused=True), once use_fused=False — and times both via
the carried-dependency lax.scan (see bench.py train_step_scan_ms; independent
dispatches are dedup/overlapped by the tunnel and cannot be trusted)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")
from bench import train_step_scan_ms  # noqa: E402
from mdctgan_tpu.configs import (  # noqa: E402
    flagship_discriminator,
    flagship_generator,
    flagship_spectral,
)
from mdctgan_tpu.ops.features import SpectralTransform  # noqa: E402
from mdctgan_tpu.parallel.mesh import enable_compilation_cache  # noqa: E402
from mdctgan_tpu.train.state import create_train_state  # noqa: E402
from mdctgan_tpu.train.step import build_train_step  # noqa: E402


def main():
    enable_compilation_cache("/tmp/mdctgan_jax_cache")
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
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
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch = {
        "lr_audio": jnp.asarray(
            0.1 * rng.standard_normal((bsz, cfg.segment_length)), jnp.float32),
        "hr_audio": jnp.asarray(
            0.1 * rng.standard_normal((bsz, cfg.segment_length)), jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    for label, fused in (("fused", True), ("xla  ", False)):
        tf_ = SpectralTransform(cfg, use_fused=fused)
        step = build_train_step(gen, disc, tf_, g_tx, d_tx, donate=False)
        ms = train_step_scan_ms(step, state, batch, key)
        print(f"[ab] batch {bsz} {label}: {ms:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
