"""jax.profiler xplane parsing shared by bench.py and tools/tpu_profile.py.

The reference has no profiling story (SURVEY.md §5.1).  Here the device
trace is the ground-truth timing source: end-to-end host timing through the
tunneled TPU is unreliable (dispatch dedup/overlap, ~50 ms RTT — CLAUDE.md),
and the differential lax.scan pays state-carry copies the real training loop
does not (~13% at flagship size), so bench.py reports the trace number.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Optional

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture_trace(run_step, out_dir: str, steps: int = 3) -> str:
    """Trace ``steps`` calls of ``run_step()`` (already compiled/warm; must
    block on its own result) and return the newest xplane.pb path."""
    import jax

    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            run_step()
    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError("no xplane capture written (device tracing failed)")
    return max(paths, key=os.path.getmtime)


def _device_plane(xplane_path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise RuntimeError("no TPU device plane in trace")
    return planes[0]


def busy_time_ms(xplane_path: str, steps: int) -> Optional[float]:
    """Per-step XLA-op busy time (sum of device op durations / steps).

    Unlike the "Steps" line this excludes device idle, so it is robust to
    host-side stalls during capture (a contended host inflates Steps events
    with in-step idle; measured 101 ms Steps vs 79.7 ms busy while a test
    suite hogged the CPU).  At ~97% duty it understates the free-running
    step by <3%."""
    pl = _device_plane(xplane_path)
    ops = [l for l in pl.lines if l.name == "XLA Ops"]
    if not ops or not ops[0].events:
        return None
    return sum(e.duration_ps for e in ops[0].events) / 1e9 / steps


def step_device_time_ms(xplane_path: str, steps: int) -> Optional[float]:
    """Mean device time of the ``steps`` longest "Steps"-line events (the
    warmup-free per-step ground truth).  Falls back to XLA-op busy time /
    steps when the Steps line is absent (e.g. donated-state chains); returns
    None only if neither line exists."""
    pl = _device_plane(xplane_path)
    step_line = [l for l in pl.lines if l.name == "Steps"]
    if step_line and step_line[0].events:
        durs = sorted((e.duration_ps / 1e9 for e in step_line[0].events),
                      reverse=True)[:steps]
        return sum(durs) / len(durs)
    ops = [l for l in pl.lines if l.name == "XLA Ops"]
    if ops and ops[0].events:
        return sum(e.duration_ps for e in ops[0].events) / 1e9 / steps
    return None


def report(xplane_path: str, steps: int, top: int = 15) -> None:
    """Per-category / per-op breakdown with achieved TFLOP/s and HBM GB/s."""
    pl = _device_plane(xplane_path)
    md = pl.event_metadata
    smd = {k: v.name for k, v in pl.stat_metadata.items()}

    def stats_of(metadata):
        out = {}
        for s in metadata.stats:
            out[smd[s.metadata_id]] = (
                s.int64_value or s.uint64_value or s.double_value or s.str_value
            )
        return out

    step_ms = step_device_time_ms(xplane_path, steps)
    if step_ms is not None:
        print(f"step device time: {step_ms:.1f} ms")

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
