"""Generate a synthetic speech-like WAV corpus + train/eval CSV indexes.

Reproduces the corpora behind the real-TPU training smokes in
docs/PERFORMANCE.md: 48 kHz mono WAVs of harmonic sweeps with a
speech-plausible spectral tilt (F0 glides 80-300 Hz, 12 partials with 1/k
rolloff, formant-ish AM, noise floor), so the 16->48 kHz task has real
high-band structure to learn.  Usage:

    python tools/make_corpus.py /tmp/corpus --n_files 1000 --seconds 2.0

writes <dir>/wav/*.wav, <dir>/train.csv and <dir>/eval.csv (90/10 split,
reference CSV format: one path per row, no header).
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

SR = 48000


def synth(rng: np.random.Generator, seconds: float) -> np.ndarray:
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = rng.uniform(80, 300)
    f1 = rng.uniform(80, 300)
    inst = f0 + (f1 - f0) * t / seconds  # linear F0 glide
    phase = 2 * np.pi * np.cumsum(inst) / SR
    x = np.zeros(n)
    for k in range(1, 13):  # 12 partials, 1/k tilt
        if k * max(f0, f1) > SR / 2:
            break
        x += rng.uniform(0.5, 1.0) / k * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
    # formant-ish slow AM + syllabic energy envelope
    am = 1 + 0.4 * np.sin(2 * np.pi * rng.uniform(2, 8) * t)
    env = 0.5 - 0.5 * np.cos(2 * np.pi * np.clip(t / seconds, 0, 1))
    x = x * am * env
    x += 0.003 * rng.standard_normal(n)  # noise floor
    x *= 0.25 / max(1e-9, np.abs(x).max())
    return x.astype(np.float32)


def write_wav(path: str, x: np.ndarray, sr: int = SR) -> None:
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_files", type=int, default=1000)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--eval_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    wav_dir = os.path.join(args.out_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    paths = []
    for i in range(args.n_files):
        p = os.path.join(wav_dir, f"{i:05d}.wav")
        write_wav(p, synth(rng, args.seconds))
        paths.append(p)
    n_eval = max(1, int(args.n_files * args.eval_frac))
    for name, rows in (("train.csv", paths[n_eval:]), ("eval.csv", paths[:n_eval])):
        with open(os.path.join(args.out_dir, name), "w") as f:
            f.write("\n".join(rows) + "\n")
    print(f"wrote {len(paths)} wavs -> {args.out_dir} "
          f"(train {len(paths) - n_eval}, eval {n_eval})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
