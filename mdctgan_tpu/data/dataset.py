"""Datasets: file-list handling and raw segment sampling.

Mirrors the reference's data layer semantics (data/audio_dataset.py):
  * train: CSV index or directory walk; per-item random segment crop with a
    cached length probe; skip-to-next on decode failure (:34-65, 84-100)
  * test: ONE file loaded whole, DC-shifted by ``1e-4 - mean``, unfolded into
    overlapping segments (:113-177)

The hot difference from the reference: the host only DECODES.  All resampling
/ degradation / noise runs on-device (see pipeline.py), so the host work per
segment is one pread + int16->float32 conversion.
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional, Tuple

import numpy as np

from mdctgan_tpu.data import native

# built-in decoders, always available (AIFF is big-endian PCM, decoded
# natively like WAV — native/audioio/audioio.cc read_aiff_header)
AUDIO_EXTS = (".wav", ".flac", ".aiff", ".aif")
# mp3 and ogg/vorbis decode through system libraries when the native layer
# finds them (native/audioio/{mp3,vorbis}.cc) — support is probed at
# runtime, not assumed: (extensions, probe attribute on ``native`` — looked
# up lazily so tests can monkeypatch it, library name for the error hint).
_OPTIONAL_DECODERS = (
    ((".mp3",), "has_mp3", "libmpg123"),
    ((".ogg",), "has_vorbis", "libvorbisfile"),
    ((".opus",), "has_opus", "libopus+libogg"),
    ((".m4a", ".aac", ".wma"), "has_ffmpeg", "ffmpeg 5.x libraries"),
)
# Audio formats the reference decodes via torchaudio/sox that this framework
# does NOT (audio_dataset.py:9,37): rejected UP FRONT with an actionable
# message instead of dying one-by-one in the corrupt-skip retry loop.
# each joins this list only when its system library is absent.
UNSUPPORTED_AUDIO_EXTS = (
    ".mp3", ".ogg", ".opus", ".m4a", ".aac", ".wma")


def supported_exts() -> Tuple[str, ...]:
    """Decodable extensions on THIS host (mp3/ogg iff their system
    decoder library loaded)."""
    exts = AUDIO_EXTS
    for opt_exts, probe, _ in _OPTIONAL_DECODERS:
        if getattr(native, probe)():
            exts = exts + opt_exts
    return exts


def unsupported_note(files: List[str]) -> str:
    """': found N .ogg (+...) files — not decodable (convert to WAV/FLAC)'
    when ``files`` contains known-unsupported audio formats, else ''."""
    supported = supported_exts()
    counts: dict = {}
    for f in files:
        ext = os.path.splitext(f)[1].lower()
        if ext in UNSUPPORTED_AUDIO_EXTS and ext not in supported:
            counts[ext] = counts.get(ext, 0) + 1
    if not counts:
        return ""
    parts = ", ".join(f"{n} {e}" for e, n in sorted(counts.items()))
    hint = " (convert to WAV or FLAC"
    for opt_exts, _, lib in _OPTIONAL_DECODERS:
        if any(e in counts for e in opt_exts):
            hint += f"; {'/'.join(opt_exts)} needs the system {lib}"
    hint += ")"
    return (f": found {parts} file(s) — these formats are not decodable "
            f"by this framework{hint}")


def list_audio_files(path: str, max_files: Optional[int] = None) -> List[str]:
    """CSV index (one path per cell, relative to the CSV's directory) or
    recursive directory walk (audio_dataset.py:84-100)."""
    if os.path.isdir(path):
        supported = supported_exts()
        files, skipped = [], []
        for root, _, names in os.walk(path):
            for name in sorted(names):
                ext = os.path.splitext(name)[1].lower()
                if ext in supported:
                    files.append(os.path.join(root, name))
                elif ext in UNSUPPORTED_AUDIO_EXTS:
                    skipped.append(name)
        files.sort()
        if not files and skipped:
            raise FileNotFoundError(
                f"no decodable audio files under {path}"
                + unsupported_note(skipped))
        if skipped:
            print(f"[data] skipping {len(skipped)} unsupported audio "
                  f"file(s) under {path}{unsupported_note(skipped)}",
                  flush=True)
    else:
        root = os.path.dirname(path)
        with open(path, "r") as f:
            files = [
                os.path.join(root, item)
                for row in csv.reader(f)
                for item in row
                if item
            ]
    if max_files is not None:
        files = files[: int(max_files)]
    if not files:
        raise FileNotFoundError(f"no audio files found under {path}")
    return files


class AudioDataset:
    """Random-crop training dataset over a file list.

    ``sample()`` returns (segment[segment_length] float32 at the file's
    native rate, sample_rate).  Like the reference (audio_dataset.py:43-52),
    it reads ``segment_length`` frames at the ORIGINAL rate from a random
    offset (the segment is later resampled on-device).
    """

    def __init__(
        self,
        index_path: str,
        segment_length: int,
        seed: int = 42,
        max_files: Optional[int] = None,
        serial: bool = False,
        deterministic: bool = False,
    ):
        self.files = list_audio_files(index_path, max_files)
        self.segment_length = int(segment_length)
        self.serial = serial  # --serial_batches: in-order instead of random
        # --deterministic_eval: FIXED per-file crop offsets (seeded by file
        # index), so repeated eval passes see identical audio and eval.csv
        # curves carry no crop noise.  The reference always random-crops
        # (audio_dataset.py:47-50); this is an additive option, default off.
        self.deterministic = deterministic
        self._cursor = 0
        self._len_cache: dict = {}
        self._seed = int(seed)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.files)

    def _probe(self, idx: int) -> Tuple[int, int]:
        if idx not in self._len_cache:
            sr, _, nframes = native.info(self.files[idx])
            self._len_cache[idx] = (sr, nframes)
        return self._len_cache[idx]

    def sample(self, idx: Optional[int] = None) -> Tuple[np.ndarray, int]:
        if idx is None:
            if self.serial:
                idx = self._cursor
                self._cursor = (self._cursor + 1) % len(self.files)
            else:
                idx = int(self._rng.integers(0, len(self.files)))
        for attempt in range(len(self.files)):
            j = (idx + attempt) % len(self.files)
            try:
                sr, nframes = self._probe(j)
                max_start = nframes - self.segment_length
                if max_start <= 0:
                    off = 0
                elif self.deterministic:
                    off = int(np.random.default_rng(
                        (self._seed, j)).integers(0, max_start))
                else:
                    off = int(self._rng.integers(0, max_start))
                data, sr = native.read(self.files[j], off, self.segment_length)
                return data, sr
            except Exception:
                # skip unreadable files, try the next (audio_dataset.py:56-65)
                continue
        raise RuntimeError(
            "no decodable audio files in dataset"
            + unsupported_note(self.files))

    def sample_batch(self, batch_size: int) -> Tuple[np.ndarray, int]:
        """Stack a batch; all VCTK files share one rate — assert homogeneous."""
        segs, rates = self.sample_batch_rates(batch_size)
        uniq = set(rates.tolist())
        if len(uniq) != 1:
            raise ValueError(f"mixed sample rates in batch: {uniq}")
        return segs, int(rates[0])

    def sample_batch_rates(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        """Stack a batch keeping each item's own sample rate (mixed-rate
        corpora: the reference resamples per item, audio_dataset.py:64-71)."""
        segs, rates = zip(*(self.sample() for _ in range(batch_size)))
        return np.stack(segs), np.asarray(rates, np.int64)


class AudioTestDataset:
    """One file -> DC shift -> overlapped fixed-length segments
    (audio_dataset.py:113-177)."""

    def __init__(
        self,
        path: str,
        segment_length: int,
        overlap: int = 0,
    ):
        raw, sr = native.read(path)
        self._init_from_array(raw, sr, segment_length, overlap)

    def _init_from_array(
        self, raw: np.ndarray, sr: int, segment_length: int, overlap: int,
        dc_shift: bool = True,
    ) -> None:
        self.segment_length = int(segment_length)
        self.overlap = int(overlap)
        self.in_sampling_rate = sr
        raw = np.asarray(raw, np.float32).reshape(-1)
        # DC shift (:146) — file path only; the reference's AudioAppDataset
        # overrides read_audio() with a no-op, so in-memory audio is NOT
        # shifted (:201-205).
        self.raw_audio = raw + (1e-4 - raw.mean()) if dc_shift else raw
        self.audio_len = len(self.raw_audio)

    def segments_of(self, audio: np.ndarray) -> np.ndarray:
        """Unfold into (n_segments, segment_length) with the reference's
        padding (audio_dataset.py:153-167).

        Records which branch was taken so ``stitch`` can mirror it exactly.
        The branch must be decided from THIS signal's length — the caller
        passes the resampled LR (at hr_sampling_rate), whose length differs
        from ``self.audio_len`` (raw input-rate length) whenever the input
        rate != hr rate, and the two can straddle ``segment_length``."""
        seg, ov = self.segment_length, self.overlap
        length = len(audio)
        self._short_segmented = length < seg
        if length >= seg:
            n = int(np.ceil(length / seg))
            padded = np.pad(audio, (ov, seg * n - length + ov))
            stride = seg - ov
            count = (len(padded) - seg) // stride + 1
            idx = np.arange(count)[:, None] * stride + np.arange(seg)[None, :]
            return padded[idx]
        return np.pad(audio, (0, seg - length))[None, :]

    def stitch(self, segments: np.ndarray) -> np.ndarray:
        """Reassemble generated segments; the inverse of ``segments_of``.

        The short-file branch above pads the TAIL only (mirroring the
        reference, audio_dataset.py:163-166), so its lone segment must NOT
        go through the edge-halving overlap-add — the reference's fold
        (generate_audio.py:40-51) would attenuate the first ``overlap`` real
        samples and shift the whole clip (a reference edge bug; fixed here,
        recorded in PARITY.md).

        Branches on the flag ``segments_of`` recorded — NOT on
        ``self.audio_len``, which is the raw length at the INPUT rate: when
        input rate != hr rate the segmented (resampled) length can land on
        the other side of ``segment_length``, and the two branches would
        disagree (edge-halving a lone tail-padded segment, or naively
        concatenating genuinely overlapped ones)."""
        short = getattr(self, "_short_segmented", None)
        if short is None:  # stitch() without segments_of(): raw-length guess
            short = self.audio_len < self.segment_length
        if self.overlap == 0 or short:
            return np.asarray(segments).reshape(-1)
        return overlap_add_segments(
            np.asarray(segments), self.segment_length, self.overlap
        )


class AudioAppDataset(AudioTestDataset):
    """In-memory variant: takes a waveform array + its sample rate instead of
    a file path (audio_dataset.py:187-205) — the embedding-API entry.  No DC
    shift: the reference's read_audio override is a no-op (:204-205)."""

    def __init__(
        self,
        audio: np.ndarray,
        sample_rate: int,
        segment_length: int,
        overlap: int = 0,
    ):
        self._init_from_array(
            audio, sample_rate, segment_length, overlap, dc_shift=False
        )


def overlap_add_segments(
    segments: np.ndarray, segment_length: int, overlap: int
) -> np.ndarray:
    """Stitch generated segments back together with edge-halving overlap-add
    (generate_audio.py:40-51); identity concat when overlap == 0."""
    if overlap == 0:
        return segments.reshape(-1)
    seg = segments.copy()
    seg[..., :overlap] *= 0.5
    seg[..., -overlap:] *= 0.5
    stride = segment_length - overlap
    n = seg.shape[0]
    out = np.zeros((n - 1) * stride + segment_length, seg.dtype)
    for i in range(n):
        out[i * stride : i * stride + segment_length] += seg[i]
    return out[overlap:-overlap]
