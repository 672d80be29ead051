#!/usr/bin/env python
"""Step-level A/B of the closed-form BatchNorm VJP (VERDICT r4 #5).

Round 4's two-pass BN variance bought gradient accuracy for +0.4 ms of step
time (64.2 -> 64.6 ms busy at batch 20).  The closed-form custom backward
(ops/norm.py batch_norm2d_train, MDCTGAN_BN_VJP=1 default) aims to claw
that back: one fused reduction pass + one elementwise pass instead of XLA
autodiff's ~4 passes over (x, g) per BN.  This script builds the flagship
G+D step twice — custom VJP on / off (plain autodiff of the same two-pass
formula) — and reports both the carried-scan time and the device-trace
busy time for each.  Reference op being twinned: BatchNorm2d inside
BottleStack (reference networks.py:341-343).
"""

import os
import sys
import tempfile

from flagship_setup import flagship_state

from bench import train_step_scan_ms
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.parallel.mesh import enable_compilation_cache
from mdctgan_tpu.train.step import build_train_step
from mdctgan_tpu.utils.profiling import busy_time_ms, capture_trace


def main():
    import jax

    enable_compilation_cache("/tmp/mdctgan_jax_cache")
    print("devices:", jax.devices(), flush=True)
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg, gen, disc, g_tx, d_tx, state, mkbatch, key = flagship_state(bsz)
    batch = mkbatch()
    for label, flag in (("custom-vjp", "1"), ("autodiff  ", "0")):
        # read at TRACE time inside _BN2D: set before the fresh closure jits
        os.environ["MDCTGAN_BN_VJP"] = flag
        tf_ = SpectralTransform(cfg)
        step = build_train_step(gen, disc, tf_, g_tx, d_tx, donate=False)
        scan_ms = train_step_scan_ms(step, state, batch, key)

        def run_once():
            _, mm = step(state, batch, key)
            float(mm["loss_G"])  # value fetch = true barrier

        run_once()  # warm/compile
        trace_ms = None
        try:
            with tempfile.TemporaryDirectory() as td:
                xp = capture_trace(run_once, td, steps=3)
                trace_ms = busy_time_ms(xp, steps=3)
        except Exception as e:
            print(f"[ab] trace unavailable: {e!r}", flush=True)
        print(
            f"[ab] batch {bsz} BN {label}: scan {scan_ms:.2f} ms/step"
            + (f", busy {trace_ms:.2f} ms" if trace_ms else ""),
            flush=True,
        )


if __name__ == "__main__":
    main()
