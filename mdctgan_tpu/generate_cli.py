#!/usr/bin/env python
"""Inference / evaluation driver — rebuild of the reference ``generate_audio.py``.

Loads audio, degrades it to LR on-device (down-up resample unless
--is_lr_input, audio_dataset.py:169-177), unfolds into overlapping segments,
runs the jitted inference stack (MDCT -> G -> IMDCT) in batches, stitches via
edge-halving overlap-add (generate_audio.py:40-51), then writes
MSE/SNR/SNRseg/LSD + sr/lr/hr WAVs to checkpoints/<name>/.

Uses TrainOptions like the reference (generate_audio.py:13 — it needs the STFT
flags that only TrainOptions defines).

Beyond the reference (which processes exactly ONE file per run): when
--dataroot is a directory or a .csv/.txt file list, every file is processed
with a single model load and ONE compiled program (all files share the padded
segment-batch shape), writing per-file ``<stem>_sr.wav`` outputs and a
``metrics.csv`` summary — the TPU-friendly batch-serving mode (compiles are
minutes through a remote tunnel; amortize them).
"""

from __future__ import annotations

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.data import native
from mdctgan_tpu.data.dataset import AudioTestDataset
from mdctgan_tpu.models.generator import build_generator
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.ops.metrics import compute_metrics
from mdctgan_tpu.ops.resample import add_noise_snr, degrade_lr, resample
from mdctgan_tpu.options import TrainOptions, spectral_config_from_opt, use_fused_from_opt
from mdctgan_tpu.train.restore import load_generator_vars
from mdctgan_tpu.train.step import build_inference_fn


class AudioLoadError(RuntimeError):
    """A corrupt/unreadable input file — distinct from device/compile
    RuntimeErrors (jax's XlaRuntimeError subclasses RuntimeError), which
    must propagate instead of being reported as 'load audio failed' or
    silently skipped in batch mode."""


def _expand_dataroot(dataroot: str):
    """Returns (paths, batch_mode).  A directory or .csv/.txt index selects
    batch mode (even for a one-file corpus — the output contract must not
    depend on corpus size); a plain audio path is the reference's
    single-file mode.  Listing reuses the training-side ``list_audio_files``
    (same CSV one-path-per-cell convention and global sort order)."""
    from mdctgan_tpu.data.dataset import list_audio_files

    if os.path.isdir(dataroot) or dataroot.lower().endswith((".csv", ".txt")):
        paths = list_audio_files(dataroot)
        if not paths:
            raise SystemExit(f"no audio files in {dataroot}")
        return paths, True
    return [dataroot], False


def _process_file(path, opt, cfg, transform, infer, g_vars, sharding=None):
    """One file through degrade -> segment -> G -> overlap-add -> metrics.
    Returns (sr, lr, hr, metrics dict)."""
    try:
        ds = AudioTestDataset(path, cfg.segment_length, overlap=opt.gen_overlap)
    except Exception as e:
        raise AudioLoadError(f"load audio failed: {path}") from e
    raw = jnp.asarray(ds.raw_audio)[None]
    print(f"Audio length: {ds.audio_len}")
    if opt.is_lr_input:
        lr_audio = resample(raw, ds.in_sampling_rate, cfg.hr_sampling_rate)
    else:
        lr_audio = degrade_lr(
            raw, ds.in_sampling_rate, cfg.lr_sampling_rate, cfg.hr_sampling_rate
        )
    if opt.add_noise:
        lr_audio = add_noise_snr(
            lr_audio, jax.random.PRNGKey(opt.seed), opt.snr, cfg.segment_length
        )
    lr_np = np.asarray(lr_audio)[0]
    segments = ds.segments_of(lr_np)  # (N, segment_length)
    print(f"#audio segments = {len(segments)}")

    outs = []
    bs = opt.batchSize
    n = len(segments)
    # pad the last batch to a full batch so one compiled program serves all
    n_pad = (-n) % bs
    padded = np.concatenate([segments, np.zeros((n_pad, cfg.segment_length),
                                                np.float32)]) if n_pad else segments
    # Non-arcsinh configs reconstruct the synthesized band with a random
    # +/-1 pseudo-phase (pix2pixHD_model.py:150-157) — feed an rng there.
    needs_phase_rng = not (
        cfg.arcsinh_transform or cfg.raw_mdct or cfg.explicit_encoding
    ) and cfg.up_ratio > 1
    base_key = jax.random.PRNGKey(opt.seed)
    # dispatch ALL batches before fetching any result: fetching inside the
    # loop serializes each batch behind a tunnel round-trip
    for i in range(0, len(padded), bs):
        key = jax.random.fold_in(base_key, i) if needs_phase_rng else None
        x = padded[i : i + bs]
        x = (jax.device_put(x, sharding) if sharding is not None
             else jnp.asarray(x))
        _, sr_audio = infer(g_vars, x, key)
        outs.append(sr_audio[..., : cfg.segment_length])
    sr_segments = np.concatenate([np.asarray(o) for o in outs])[:n]

    sr = ds.stitch(sr_segments)
    # sr/lr live at cfg.hr_sampling_rate while the raw input may be at
    # another rate.  The reference crops everything to the RAW sample count
    # and compares pointwise anyway (generate_audio.py:57-60) — for a
    # rate-mismatched input that truncates the SR to in_rate/hr_rate of its
    # duration and diffs signals at different rates.  Here the reference
    # signal is resampled to the HR rate first, so the comparison is
    # rate-consistent and the written SR keeps its full duration; for the
    # common equal-rate corpus this is bit-identical to the reference crop.
    # (With gen_overlap > 0 the unfold can also drop a sub-stride tail —
    # the reference crashes there; the min() crop below handles it.)
    if ds.in_sampling_rate == cfg.hr_sampling_rate:
        hr_ref, hr_rate = ds.raw_audio, ds.in_sampling_rate
    else:
        hr_ref = np.asarray(
            resample(jnp.asarray(ds.raw_audio)[None], ds.in_sampling_rate,
                     cfg.hr_sampling_rate)
        )[0]
        hr_rate = cfg.hr_sampling_rate
    audio_len = min(len(hr_ref), len(sr), len(lr_np))
    hr = hr_ref[:audio_len]
    m = compute_metrics(
        jnp.asarray(hr)[None],
        jnp.asarray(lr_np[:audio_len])[None],
        jnp.asarray(sr[:audio_len])[None],
        cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.center,
        fs=cfg.hr_sampling_rate,
    )
    host = jax.device_get(m)  # keep m's key order (pytrees sort dict keys)
    metrics = {k: float(host[k]) for k in m}
    print(f"MSE: {metrics['mse']:.4f}")
    print(f"SNR_SR: {metrics['snr_sr']:.4f}")
    print(f"SNR_LR: {metrics['snr_lr']:.4f}")
    print(f"SNR_SEG: {metrics['snr_seg']:.4f}")
    print(f"LSD: {metrics['lsd']:.4f}")
    return sr[:audio_len], lr_np[:audio_len], hr, hr_rate, metrics


def main() -> None:
    from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env

    honor_jax_platforms_env()
    opt = TrainOptions().parse(save=False)
    if getattr(opt, "matmul_precision", "default") != "default":
        from mdctgan_tpu.parallel.mesh import set_default_matmul_precision

        set_default_matmul_precision(opt.matmul_precision)
    if getattr(opt, "jax_cache_dir", ""):
        from mdctgan_tpu.parallel.mesh import enable_compilation_cache

        enable_compilation_cache(opt.jax_cache_dir)
    cfg = spectral_config_from_opt(opt)
    expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
    os.makedirs(expr_dir, exist_ok=True)

    paths, batch_mode = _expand_dataroot(opt.dataroot)

    # Data-parallel serving (no reference equivalent — it is single-GPU):
    # --gpu_ids 0,1,... shards each segment batch over a device mesh with
    # replicated weights, same as training's DP axis.  Per-sample math is
    # unchanged (no cross-batch ops at inference), so outputs match the
    # single-device run.
    mesh = None
    sharding = None
    n_dev = max(1, min(len(opt.gpu_ids) or 1, len(jax.devices())))
    if n_dev > 1 and opt.batchSize % n_dev:
        print(f"[mesh] batchSize {opt.batchSize} not divisible by {n_dev} "
              "devices — serving on 1 device")
        n_dev = 1
    if n_dev > 1:
        from mdctgan_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicate,
        )

        mesh = make_mesh(n_dev)
        sharding = batch_sharding(mesh)
        print(f"[mesh] data-parallel serving over {n_dev} devices")

    transform = SpectralTransform(cfg, use_fused=use_fused_from_opt(opt),
                                  mesh=mesh)
    generator = build_generator(opt)
    g_vars = load_generator_vars(opt, generator, cfg)
    if mesh is not None:
        g_vars = replicate(g_vars, mesh)
    infer = build_inference_fn(generator, transform, out_length=cfg.segment_length)

    if not batch_mode:
        # reference-parity single-file mode: fixed output names + metric.txt
        try:
            sr, lr, hr, in_sr, m = _process_file(
                paths[0], opt, cfg, transform, infer, g_vars, sharding
            )
        except AudioLoadError:
            # reference behavior: print and exit (audio_dataset.py:149-151)
            raise SystemExit("load audio failed")
        with open(os.path.join(expr_dir, "metric.txt"), "w") as f:
            f.write("MSE,SNR_SR,LSD\n")
            f.write(f"{m['mse']:f},{m['snr_sr']:f},{m['lsd']:f}")
        native.write_wav16(os.path.join(expr_dir, "sr_audio.wav"),
                           sr, cfg.hr_sampling_rate)
        native.write_wav16(os.path.join(expr_dir, "lr_audio.wav"),
                           lr, cfg.hr_sampling_rate)
        native.write_wav16(os.path.join(expr_dir, "hr_audio.wav"),
                           hr, in_sr)
        return

    # batch mode: one model load / one compiled program over the corpus.
    # A corrupt file is skipped (mirrors the training dataset's retry-skip);
    # output names are de-duplicated when different subdirectories share a
    # basename, and metrics.csv records the name actually written.
    rows = []
    used_names = set()
    for path in paths:
        print(f"=== {path}")
        try:
            sr, _, _, _, m = _process_file(
                path, opt, cfg, transform, infer, g_vars, sharding
            )
        except AudioLoadError as e:
            print(f"[batch] skipping: {e}")
            continue
        stem = os.path.splitext(os.path.basename(path))[0]
        name, k = f"{stem}_sr.wav", 1
        while name in used_names:
            name, k = f"{stem}_{k}_sr.wav", k + 1
        used_names.add(name)
        native.write_wav16(os.path.join(expr_dir, name), sr,
                           cfg.hr_sampling_rate)
        rows.append({"file": path, "output": name, **m})
    if not rows:
        raise SystemExit("no file in the corpus could be processed")
    with open(os.path.join(expr_dir, "metrics.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
        # NaN-aware MEAN: a single sub-frame clip returns snr_seg=NaN
        # (ops/metrics.py) and must not blank the column for the corpus
        from mdctgan_tpu.ops.metrics import nanmean_rows

        mean = nanmean_rows(
            [{k: v for k, v in r.items() if k not in ("file", "output")}
             for r in rows]
        )
        w.writerow({"file": "MEAN", **mean})
    print(f"[batch] {len(rows)}/{len(paths)} files -> {expr_dir}/metrics.csv "
          f"(mean LSD {mean['lsd']:.4f}, mean SNR_SR {mean['snr_sr']:.4f})")


if __name__ == "__main__":
    main()
