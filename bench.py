"""Headline benchmark (run on real TPU by the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: MDCT forward, batch 64 x 32512 samples, n_fft 512 — the only
number the reference publishes (README.md:104-110): 9.61 ms on an RTX 3070
laptop (FastMDCT4: 7.68 ms).  vs_baseline = baseline_ms / our_ms (higher is
better).  Secondary numbers (train-step time, inference RTF) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MDCT_MS = 9.61  # reference README.md:104-107 (RTX 3070 laptop)


def timeit(fn, *args, warmup: int = 3, iters: int = 50) -> float:
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main() -> None:
    from mdctgan_tpu.ops.mdct import MDCT

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 32512)), jnp.float32)
    m = MDCT(512)
    fwd = jax.jit(lambda a: m(a))
    mdct_ms = timeit(fwd, x)
    print(f"[bench] MDCT fwd 64x32512: {mdct_ms:.3f} ms", file=sys.stderr)

    # Secondary: flagship inference RTF (1 segment = 32512/48000 s of audio).
    try:
        from mdctgan_tpu.configs import flagship_generator, flagship_spectral
        from mdctgan_tpu.ops.features import SpectralTransform
        from mdctgan_tpu.train.step import build_inference_fn

        cfg = flagship_spectral()
        tf_ = SpectralTransform(cfg)
        gen = flagship_generator()
        g_vars = gen.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.n_bins, cfg.n_fft // 2, 2)),
            train=False,
        )
        infer = build_inference_fn(gen, tf_, out_length=cfg.segment_length)
        lr = jnp.asarray(0.1 * rng.standard_normal((1, cfg.segment_length)), jnp.float32)
        inf_ms = timeit(lambda v, a: infer(v, a)[1], g_vars, lr, warmup=2, iters=20)
        rtf = (inf_ms / 1e3) / (cfg.segment_length / cfg.hr_sampling_rate)
        print(f"[bench] flagship inference: {inf_ms:.2f} ms/segment, RTF={rtf:.4f}",
              file=sys.stderr)
    except Exception as e:  # secondary metrics must not break the headline
        print(f"[bench] inference bench skipped: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "mdct_forward_b64x32512_nfft512",
        "value": round(mdct_ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MDCT_MS / mdct_ms, 3),
    }))


if __name__ == "__main__":
    main()
