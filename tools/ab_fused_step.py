#!/usr/bin/env python
"""Train-step-level A/B of the fused Pallas MDCT path vs the XLA path on the
real TPU (VERDICT r1 item 3): builds the flagship G+D step twice — once with
SpectralTransform(use_fused=True), once use_fused=False — and times both via
the carried-dependency lax.scan (see bench.py train_step_scan_ms; independent
dispatches are dedup/overlapped by the tunnel and cannot be trusted)."""

import sys

from flagship_setup import flagship_state

from bench import train_step_scan_ms
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.parallel.mesh import enable_compilation_cache
from mdctgan_tpu.train.step import build_train_step


def main():
    import jax

    enable_compilation_cache("/tmp/mdctgan_jax_cache")
    print("devices:", jax.devices(), flush=True)
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg, gen, disc, g_tx, d_tx, state, mkbatch, key = flagship_state(bsz)
    batch = mkbatch()
    for label, fused in (("fused", True), ("xla  ", False)):
        tf_ = SpectralTransform(cfg, use_fused=fused)
        step = build_train_step(gen, disc, tf_, g_tx, d_tx, donate=False)
        ms = train_step_scan_ms(step, state, batch, key)
        print(f"[ab] batch {bsz} {label}: {ms:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
