"""Input-feed throughput probe: where does a train step's host time go?

Measures, on the current JAX backend (real TPU through the tunnel, or a CPU
mesh with the usual env overrides):

  1. host decode rate — NativePrefetcher segments/s on a synthetic corpus;
  2. H2D transfer — ms per (batch, segment) device_put, float32 vs int16
     payloads (the candidate bytes-halving feed format), measured with
     distinct arrays + block_until_ready so the tunnel cannot dedupe;
  3. full InputPipeline rate — batches/s with the on-device degrade.

Usage: python tools/feed_probe.py [--batch 20] [--iters 20] [--corpus DIR]
(writes/reuses a small corpus via tools/make_corpus.py when DIR is absent).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--segment", type=int, default=32512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--corpus", type=str, default="/tmp/feed_probe_corpus")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.corpus, "train.csv")):
        from tools.make_corpus import main as make_main  # noqa: PLC0415
        make_main([args.corpus, "--n_files", "64", "--seconds", "1.0"])

    from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax

    dev = jax.devices()[0]
    print(f"[probe] backend: {dev.platform} ({dev})", flush=True)
    rng = np.random.default_rng(0)
    b, t, n = args.batch, args.segment, args.iters

    # -- 2) H2D: distinct payloads, fully blocked ------------------------- #
    for name, arrs in (
        ("float32", [rng.standard_normal((b, t)).astype(np.float32)
                     for _ in range(n)]),
        ("int16", [(rng.standard_normal((b, t)) * 8000).astype(np.int16)
                   for _ in range(n)]),
    ):
        jax.device_put(arrs[0]).block_until_ready()  # warm path
        t0 = time.perf_counter()
        for a in arrs:
            jax.device_put(a).block_until_ready()
        dt = (time.perf_counter() - t0) / n
        mb = arrs[0].nbytes / 1e6
        print(f"[probe] H2D {name}: {dt * 1e3:.1f} ms per {mb:.2f} MB batch "
              f"({mb / dt:.1f} MB/s)", flush=True)

    # -- 1) decode rate --------------------------------------------------- #
    from mdctgan_tpu.data import native
    files = [line.strip() for line in
             open(os.path.join(args.corpus, "train.csv"))]
    if native.load_library() is not None:
        pf = native.NativePrefetcher(files, t, n_threads=8,
                                     queue_cap=4 * b, seed=0)
        for _ in range(b):  # warm queue
            pf.next()
        t0 = time.perf_counter()
        for _ in range(n * b):
            pf.next()
        dt = time.perf_counter() - t0
        print(f"[probe] native decode: {n * b / dt:.0f} segments/s "
              f"({n * b / dt / b:.1f} batches/s at batch {b})", flush=True)
        pf.close()

    # -- 3) full pipeline ------------------------------------------------- #
    from mdctgan_tpu.data.dataset import AudioDataset
    from mdctgan_tpu.data.pipeline import InputPipeline
    from mdctgan_tpu.ops.features import SpectralConfig

    cfg = SpectralConfig(segment_length=t)
    ds = AudioDataset(os.path.join(args.corpus, "train.csv"),
                      segment_length=t)
    pipe = InputPipeline(ds, cfg, b, n_threads=8)
    it = iter(pipe)
    batch = next(it)
    jax.block_until_ready(batch)
    t0 = time.perf_counter()
    for _ in range(n):
        batch = next(it)
        jax.block_until_ready(batch)
    dt = (time.perf_counter() - t0) / n
    print(f"[probe] full pipeline: {dt * 1e3:.1f} ms/batch "
          f"({b / dt:.0f} samples/s)", flush=True)
    pipe.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
