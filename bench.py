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


def device_time_scan(
    fn, x, consts=None, n_lo: int = 4, n_hi: int = 104, reps: int = 5
) -> float:
    """Per-iteration DEVICE time of ``fn(x[, consts])`` via a differential scan.

    For sub-millisecond ops the tunnel's per-dispatch overhead (~tens of ms)
    swamps any end-to-end timing, so run N sequential iterations INSIDE one
    jitted lax.scan (each iteration's input perturbed by a value derived from
    the previous output, defeating both caching and parallelization) and
    report (t(n_hi) - t(n_lo)) / (n_hi - n_lo).

    ``consts`` (e.g. model params) are passed as a jit ARGUMENT — closing over
    large arrays would bake them into the HLO as constants (and overflow the
    remote-compile request).
    """

    def make(n):
        @jax.jit
        def loop(x0, c):
            def body(carry, i):
                out = fn(carry) if c is None else fn(carry, c)
                s = sum(jnp.sum(o) for o in jax.tree.leaves(out))
                # chain dependency without changing the value materially
                nxt = carry + (s * 1e-30 + i * 1e-6)
                return nxt, s

            _, ss = jax.lax.scan(body, x0, jnp.arange(n, dtype=x0.dtype))
            return jnp.sum(ss)

        return loop

    lo, hi = make(n_lo), make(n_hi)

    def timed(f, xr):
        t0 = time.perf_counter()
        # NB: fetch the scalar, don't block_until_ready — through the
        # remote tunnel block_until_ready can return before the work
        # ran (measured 0.09 ms for a seconds-long scan); only a value
        # transfer is a true barrier.  The scalar fetch RTT is constant
        # and cancels in the lo/hi difference.
        float(f(xr, consts))
        return time.perf_counter() - t0

    # compile + warm (fetch forces completion)
    float(lo(x, consts)), float(hi(x, consts))
    diffs = []
    for r in range(reps):
        # Two noise defenses, both tunnel-taught (docs/PERFORMANCE.md
        # "Measurement methodology"): every rep gets a DISTINCT input —
        # byte-identical repeat calls can be deduped/served-from-cache by
        # the tunnel runtime — and lo/hi run back-to-back per rep with the
        # MEDIAN of paired differences reported, so a bursty host (the
        # wall clock lives host-side) shifts both ends of a pair together
        # instead of corrupting independent min() estimates.
        xr = x + jnp.asarray(r + 1, x.dtype) * jnp.asarray(1e-6, x.dtype)
        diffs.append(timed(hi, xr) - timed(lo, xr))
    return max(float(np.median(diffs)), 1e-9) / (n_hi - n_lo) * 1e3  # ms/iter


def train_step_scan_ms(step_fn, state, batch, key,
                       n_lo: int = 1, n_hi: int = 6, reps: int = 3) -> float:
    """Per-step DEVICE time of a full train step via a differential scan.

    Timing a loop of independent async dispatches became unreliable on this
    tunnel: calls sharing the same input ``state`` are data-independent and
    the runtime overlaps/dedupes them even with perturbed batches (measured
    3.5 ms/step against a ground-truth device-trace time of 82 ms).
    Carrying the state through a
    ``lax.scan`` makes every iteration depend on the previous one — the
    device MUST run them sequentially — and (t(n_hi) - t(n_lo)) / (n_hi -
    n_lo) cancels the per-dispatch tunnel overhead.  Matches the device
    trace to within a fraction of a ms."""

    def make(n):
        @jax.jit
        def loop(state0, b0, k):
            def body(carry, i):
                b = jax.tree.map(lambda v: v + i * 1e-6, b0)
                s2, m = step_fn(carry, b, k)
                return s2, m["loss_G"]

            _, losses = jax.lax.scan(
                body, state0, jnp.arange(n, dtype=jnp.float32)
            )
            return losses[-1]

        return loop

    lo, hi = make(n_lo), make(n_hi)

    def run(f):
        float(f(state, batch, key))  # compile + warm (fetch = true barrier)
        best = float("inf")
        for r in range(reps):
            # distinct key per rep: byte-identical repeat calls can be
            # deduped by the tunnel runtime (measured at batch 40: 88.98 ms
            # with identical reps vs a stable 121.6/124.5 ms min/median with
            # per-rep keys, against a 108.3 ms trace busy time — the scan's
            # +13% carry-copy overhead only shows up once reps are unique)
            k = jax.random.fold_in(key, r)
            t0 = time.perf_counter()
            float(f(state, batch, k))  # see device_time_scan: fetch, not block
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(lo), run(hi)
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo) * 1e3  # ms/step


def main() -> None:
    import os

    from mdctgan_tpu.ops.mdct import MDCT
    from mdctgan_tpu.parallel.mesh import enable_compilation_cache

    # Remote-TPU compiles are minutes; a persistent cache makes repeat bench
    # runs near-instant (set MDCTGAN_BENCH_CACHE_DIR="" to disable).
    cache_dir = os.environ.get("MDCTGAN_BENCH_CACHE_DIR",
                               "/tmp/mdctgan_jax_cache")
    if cache_dir:
        enable_compilation_cache(cache_dir)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 32512)), jnp.float32)
    m = MDCT(512)
    # 800-iteration differential: the ~0.09 ms op needs a long scan for a
    # stable reading through the tunnel (see the fused-MDCT A/B note in
    # docs/PERFORMANCE.md — short pairs have misread sub-0.1 ms ops by 2x)
    mdct_ms = device_time_scan(lambda a: m(a), x, n_lo=8, n_hi=808)
    print(f"[bench] MDCT fwd 64x32512: {mdct_ms:.3f} ms (device time)",
          file=sys.stderr)

    # Secondary metrics also ride the final JSON line (the driver records
    # only the LAST line, so round-over-round step/RTF tracking lives here).
    extra = {}

    # Secondary: fused Pallas MDCT+normalize kernel vs the XLA path.  These
    # two A/B ratios gate `SpectralTransform.fused_min_batch`, so they ride
    # the parsed JSON (a round-4 sign flip at batch 20 was visible only in
    # this stderr tail — VERDICT r4 weak #5).
    try:
        from mdctgan_tpu.ops.pallas_mdct import is_tpu, mdct_spectro_fused

        if is_tpu():
            for bsz in (20, 64):
                xb = x[:bsz]
                # sub-30us ops need a LONG differential: a 100-iter scan pair
                # once read 0.017 ms for a stable-0.036 ms op (tunnel noise);
                # 800 iterations make the differential ~25 ms, far above it
                fused_ms = device_time_scan(
                    lambda a: mdct_spectro_fused(
                        a, gain=1000.0, scale=0.5, shift=0.25
                    ),
                    xb, n_lo=8, n_hi=808,
                )
                unfused_ms = device_time_scan(
                    lambda a: jnp.arcsinh(1000.0 * m(a)) / np.log(10.0) * 0.5
                    + 0.25,
                    xb, n_lo=8, n_hi=808,
                )
                extra[f"fused_b{bsz}_ms"] = round(fused_ms, 4)
                extra[f"xla_b{bsz}_ms"] = round(unfused_ms, 4)
                print(
                    f"[bench] MDCT+normalize {bsz}x32512: fused pallas "
                    f"{fused_ms:.3f} ms vs XLA {unfused_ms:.3f} ms "
                    f"({unfused_ms / fused_ms:.2f}x)",
                    file=sys.stderr,
                )
    except Exception as e:
        print(f"[bench] pallas bench skipped: {e!r}", file=sys.stderr)

    # Secondary: flagship G+D train step (batch 20, bf16 — the BASELINE.json
    # config-4 geometry; the reference publishes no step time to compare).
    try:
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
        key = jax.random.PRNGKey(1)

        print(
            f"[bench] transform path: "
            f"{'fused-pallas' if tf_.use_fused else 'xla'} "
            f"(auto gate, min_batch {tf_.fused_min_batch})",
            file=sys.stderr,
        )
        # batch 20 = train.sh's shipped batchSize (the contract number);
        # batch 40 = the tuned-throughput recommendation (+~15%/sample on
        # v5e, docs/PERFORMANCE.md) — both tracked round-over-round.
        for bsz in (20, 40):
            batch = {
                "lr_audio": jnp.asarray(
                    0.1 * rng.standard_normal((bsz, cfg.segment_length)),
                    jnp.float32,
                ),
                "hr_audio": jnp.asarray(
                    0.1 * rng.standard_normal((bsz, cfg.segment_length)),
                    jnp.float32,
                ),
            }
            step_ms = train_step_scan_ms(step, state, batch, key)
            # Ground truth: a jax.profiler device trace of 3 steps.  The scan
            # number pays state-carry copies the real training loop does not
            # (~13-17% at flagship size; docs/PERFORMANCE.md), so the trace's
            # XLA-op busy time is the reported per-step time when available.
            trace_ms = None
            try:
                import tempfile

                from mdctgan_tpu.utils.profiling import (
                    busy_time_ms,
                    capture_trace,
                )

                # donate=False reuses the scan's compiled program and keeps
                # the profiler's "Steps" line; a donated+chained A/B measured
                # the same device busy time (79.6 vs 79.7 ms)

                def run_once():
                    _, mm = step(state, batch, key)
                    float(mm["loss_G"])  # value fetch = true barrier

                run_once()  # warm
                with tempfile.TemporaryDirectory() as td:
                    xp = capture_trace(run_once, td, steps=3)
                    # busy time, not the "Steps" line: Steps events absorb
                    # in-step device idle when the host stalls mid-capture
                    trace_ms = busy_time_ms(xp, steps=3)
            except Exception as e:
                print(f"[bench] trace timing unavailable: {e!r}",
                      file=sys.stderr)
            best_ms = trace_ms if trace_ms else step_ms
            suffix = "" if bsz == 20 else f"_b{bsz}"
            extra[f"train_step_busy_ms{suffix}"] = round(best_ms, 2)
            extra[f"train_step_scan_ms{suffix}"] = round(step_ms, 2)
            extra[f"samples_per_s_chip{suffix}"] = round(bsz * 1e3 / best_ms, 1)
            if bsz == 20:
                # MFU at the contract batch: XLA's own FLOP count for the
                # compiled step over the measured busy time, vs the v5e bf16
                # peak (197 TF/s/chip).  Tracked in the JSON so a FLOP or
                # utilization regression shows in round-over-round diffs.
                try:
                    ca = step.lower(state, batch, key).compile().cost_analysis()
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    tflop = float(ca["flops"]) / 1e12
                    if tflop > 0:
                        extra["model_tflop_per_step"] = round(tflop, 3)
                        extra["mfu_pct_v5e_bf16"] = round(
                            tflop / (best_ms / 1e3) / 197.0 * 100.0, 1)
                        print(
                            f"[bench] step FLOPs {tflop:.2f} TF -> "
                            f"{extra['mfu_pct_v5e_bf16']:.1f}% MFU "
                            "(v5e bf16 peak 197 TF/s)",
                            file=sys.stderr,
                        )
                except Exception as e:
                    print(f"[bench] cost analysis unavailable: {e!r}",
                          file=sys.stderr)
            print(
                f"[bench] flagship G+D train step (batch {bsz}, bf16): "
                f"{best_ms:.2f} ms = {bsz * 1e3 / best_ms:.0f} samples/s/chip "
                f"(device busy time"
                f"{'' if trace_ms else ' unavailable — scan-chained'}; "
                f"scan-chained cross-check {step_ms:.2f} ms incl. carry "
                "copies)",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] train-step bench skipped: {e!r}", file=sys.stderr)

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
        # n_hi=202: a 26-iter pair carries only ~40 ms of signal and one
        # noisy rep once halved this reading to 0.81 ms; 202 iters = ~320 ms
        # of signal, and long-scan cross-checks (2,402)/(402,802) both read
        # 1.55 ms/iter, agreeing with this pair at quiet-host conditions.
        inf_ms = device_time_scan(
            lambda a, v: infer(v, a)[1][..., : cfg.segment_length],
            lr, consts=g_vars, n_lo=2, n_hi=202, reps=4,
        )
        rtf = (inf_ms / 1e3) / (cfg.segment_length / cfg.hr_sampling_rate)
        extra["inference_ms_per_segment"] = round(inf_ms, 2)
        extra["inference_rtf"] = round(rtf, 5)
        print(f"[bench] flagship inference: {inf_ms:.2f} ms/segment, RTF={rtf:.4f}",
              file=sys.stderr)
    except Exception as e:  # secondary metrics must not break the headline
        print(f"[bench] inference bench skipped: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "mdct_forward_b64x32512_nfft512",
        "value": round(mdct_ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MDCT_MS / mdct_ms, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
