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
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def build_and_trace(batch: int, steps: int, out_dir: str) -> str:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from mdctgan_tpu.configs import (
        flagship_discriminator,
        flagship_generator,
        flagship_spectral,
    )
    from mdctgan_tpu.ops.features import SpectralTransform
    from mdctgan_tpu.train.state import create_train_state
    from mdctgan_tpu.train.step import build_train_step

    cfg = flagship_spectral()
    transform = SpectralTransform(cfg)
    gen = flagship_generator(dtype=jnp.bfloat16)
    disc = flagship_discriminator(dtype=jnp.bfloat16)
    g_tx = optax.adam(2e-4, b1=0.5)
    d_tx = optax.adam(2e-4, b1=0.5)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, g_tx, d_tx,
        spectro_shape=(cfg.n_bins, cfg.n_fft // 2),
        g_in_channels=2, d_in_channels=3,
    )
    step = build_train_step(gen, disc, transform, g_tx, d_tx, donate=False)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    def mkbatch():
        return {
            "lr_audio": jnp.asarray(
                0.1 * rng.standard_normal((batch, cfg.segment_length)),
                jnp.float32,
            ),
            "hr_audio": jnp.asarray(
                0.1 * rng.standard_normal((batch, cfg.segment_length)),
                jnp.float32,
            ),
        }

    _, m = step(state, mkbatch(), key)  # compile + warm
    jax.block_until_ready(m["loss_G"])
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            _, m = step(state, mkbatch(), key)
            jax.block_until_ready(m["loss_G"])
    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError("no xplane capture written (device tracing failed)")
    return max(paths, key=os.path.getmtime)


def report(xplane_path: str, steps: int, top: int = 15) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise RuntimeError("no TPU device plane in trace")
    pl = planes[0]
    md = pl.event_metadata
    smd = {k: v.name for k, v in pl.stat_metadata.items()}

    def stats_of(metadata):
        out = {}
        for s in metadata.stats:
            out[smd[s.metadata_id]] = (
                s.int64_value or s.uint64_value or s.double_value or s.str_value
            )
        return out

    step_line = [l for l in pl.lines if l.name == "Steps"]
    if step_line:
        durs = sorted((e.duration_ps / 1e9 for e in step_line[0].events),
                      reverse=True)[:steps]
        print(f"step device time: {sum(durs)/len(durs):.1f} ms "
              f"(individual: {[round(d, 1) for d in durs]})")

    ops = [l for l in pl.lines if l.name == "XLA Ops"][0]
    cat_t = defaultdict(float)
    cat_f = defaultdict(float)
    cat_b = defaultdict(float)
    op_t = defaultdict(float)
    op_f = defaultdict(float)
    for e in ops.events:
        st = stats_of(md[e.metadata_id])
        cat = st.get("hlo_category", "?")
        t = e.duration_ps / 1e12
        f = float(st.get("flops", 0) or 0)
        cat_t[cat] += t
        cat_f[cat] += f
        cat_b[cat] += float(st.get("bytes_accessed", 0) or 0)
        key = str(st.get("tf_op", "?"))[:90]
        op_t[key] += t
        op_f[key] += f
    total_t, total_f = sum(cat_t.values()), sum(cat_f.values())
    print(f"per-step: {total_t/steps*1e3:.1f} ms busy, "
          f"{total_f/steps/1e12:.2f} TFLOP, "
          f"avg {total_f/total_t/1e12:.1f} TFLOP/s")
    print("\nby HLO category (per step):")
    for c in sorted(cat_t, key=lambda c: -cat_t[c])[:10]:
        t, f, b = cat_t[c] / steps, cat_f[c] / steps, cat_b[c] / steps
        print(f"  {c:28s} {t*1e3:7.2f} ms  {f/1e9:9.1f} GFLOP "
              f"{f/max(t,1e-12)/1e12:6.1f} TF/s  "
              f"{b/max(t,1e-12)/1e9:6.0f} GB/s")
    print(f"\ntop {top} ops by device time (per step):")
    for name, t in sorted(op_t.items(), key=lambda kv: -kv[1])[:top]:
        f = op_f[name]
        print(f"  {t/steps*1e3:6.2f} ms {f/steps/1e9:8.1f} GF "
              f"{f/max(t,1e-12)/1e12:6.1f} TF/s  {name}")


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
