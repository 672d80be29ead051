"""TPU device-time profiler for the flagship train step.

The reference has no profiling story at all (SURVEY.md §5.1); this tool
captures a ``jax.profiler`` device trace of N train steps and prints a
per-category / per-op breakdown with achieved TFLOP/s and HBM bandwidth —
parsed straight from the xplane protobuf, so it needs no TensorBoard UI
(handy on headless TPU workers).

Usage:
    python tools/tpu_profile.py [--batch 20] [--steps 3] [--out /tmp/tbtrace]

Methodology notes (see CLAUDE.md "Environment gotchas"): end-to-end host
timing through a tunneled TPU is unreliable (dispatch caching, ~50 ms RTT);
the device trace's "Steps" line is the ground truth.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def build_and_trace(batch: int, steps: int, out_dir: str) -> str:
    import jax

    from flagship_setup import flagship_state

    from mdctgan_tpu.ops.features import SpectralTransform
    from mdctgan_tpu.train.step import build_train_step

    cfg, gen, disc, g_tx, d_tx, state, mkbatch, key = flagship_state(batch)
    transform = SpectralTransform(cfg)
    # donate=False so the un-donated state can be fed repeatedly and the
    # profiler emits its "Steps" line; a donated+chained A/B measured the
    # same device busy time (79.6 vs 79.7 ms), so this costs nothing
    step = build_train_step(gen, disc, transform, g_tx, d_tx, donate=False)

    from mdctgan_tpu.utils.profiling import capture_trace

    _, m = step(state, mkbatch(), key)  # compile + warm
    jax.block_until_ready(m["loss_G"])

    def run():
        _, mm = step(state, mkbatch(), key)
        jax.block_until_ready(mm["loss_G"])

    return capture_trace(run, out_dir, steps)


def report(xplane_path: str, steps: int, top: int = 15) -> None:
    from mdctgan_tpu.utils.profiling import report as _report

    _report(xplane_path, steps, top=top)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", type=str, default="/tmp/mdctgan_tpu_trace")
    ap.add_argument("--xplane", type=str, default="",
                    help="skip capture; analyze this xplane.pb")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()
    path = args.xplane or build_and_trace(args.batch, args.steps, args.out)
    print(f"analyzing {path}", file=sys.stderr)
    report(path, args.steps, top=args.top)


if __name__ == "__main__":
    main()
