"""Data-layer tests: native WAV decode parity with the Python fallback,
dataset sampling, segmentation/overlap-add, and the input pipeline
(reference behavior: data/audio_dataset.py, generate_audio.py:40-51)."""

import os
import wave

import numpy as np
import pytest

from mdctgan_tpu.data import native
from mdctgan_tpu.data.dataset import (
    AudioDataset,
    AudioTestDataset,
    list_audio_files,
    overlap_add_segments,
)


def write_wav(path, data, sr=48000):
    pcm = (np.clip(data, -1, 1) * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture
def wav_dir(tmp_path, rng):
    for i in range(3):
        data = 0.5 * np.sin(2 * np.pi * 440 * np.arange(48000) / 48000)
        write_wav(str(tmp_path / f"a{i}.wav"), data + 0.01 * i)
    return tmp_path


def test_native_lib_builds():
    assert native.load_library() is not None


def test_info_and_read_match_python(wav_dir):
    path = str(wav_dir / "a0.wav")
    sr, ch, nframes = native.info(path)
    assert (sr, ch, nframes) == (48000, 1, 48000)
    nat, sr1 = native.read(path, 100, 1000)
    py, sr2 = native._py_read(path, 100, 1000)
    assert sr1 == sr2 == 48000
    np.testing.assert_allclose(nat, py, atol=0)


def test_read_past_eof_zero_pads(wav_dir):
    path = str(wav_dir / "a0.wav")
    data, _ = native.read(path, 47000, 2000)
    assert data.shape == (2000,)
    assert np.all(data[1000:] == 0.0)


def test_write_wav16_roundtrip(tmp_path, rng):
    data = (0.3 * rng.standard_normal(1000)).astype(np.float32)
    path = str(tmp_path / "out.wav")
    native.write_wav16(path, data, 16000)
    back, sr = native.read(path)
    assert sr == 16000
    np.testing.assert_allclose(back, np.clip(data, -1, 1), atol=1 / 32767.0)


def test_list_audio_files_csv_and_dir(wav_dir):
    files = list_audio_files(str(wav_dir))
    assert len(files) == 3
    csv_path = wav_dir / "index.csv"
    csv_path.write_text("a0.wav\na1.wav\n")
    files = list_audio_files(str(csv_path))
    assert len(files) == 2 and files[0].endswith("a0.wav")


def test_unsupported_formats_rejected_actionably(tmp_path, wav_dir,
                                                 monkeypatch):
    """On a host WITHOUT libmpg123 (simulated here — the decodable case is
    tests/test_mp3.py), mp3 joins the not-decodable formats the reference
    handles via torchaudio/sox (audio_dataset.py:9,37).  A directory of only
    mp3s must fail up front naming the format, not enumerate then die
    file-by-file in the corrupt-skip loop; an explicit CSV entry must surface
    the same actionable note from the retry-exhausted error."""
    import pytest

    monkeypatch.setattr(native, "has_mp3", lambda: False)
    mp3_dir = tmp_path / "mp3s"
    mp3_dir.mkdir()
    for i in range(2):
        (mp3_dir / f"song{i}.mp3").write_bytes(b"\xff\xfb\x90\x00" + b"x" * 64)
    with pytest.raises(FileNotFoundError, match=r"2 \.mp3.*WAV or FLAC"):
        list_audio_files(str(mp3_dir))

    # mixed dir: wavs enumerate, mp3s are skipped (not retried as corrupt)
    (wav_dir / "extra.mp3").write_bytes(b"\xff\xfb\x90\x00" + b"x" * 64)
    files = list_audio_files(str(wav_dir))
    assert not any(f.endswith(".mp3") for f in files)

    # CSV pointing straight at an mp3: the decode-retry exhaustion error
    # names the unsupported format instead of a bare "no decodable files"
    csv_path = mp3_dir / "index.csv"
    csv_path.write_text("song0.mp3\nsong1.mp3\n")
    ds = AudioDataset(str(csv_path), segment_length=8000, seed=0)
    with pytest.raises(RuntimeError, match=r"\.mp3.*WAV or FLAC"):
        ds.sample()


def test_dataset_sample(wav_dir):
    ds = AudioDataset(str(wav_dir), segment_length=8000, seed=0)
    seg, sr = ds.sample()
    assert seg.shape == (8000,) and sr == 48000
    batch, sr = ds.sample_batch(4)
    assert batch.shape == (4, 8000)


def test_dataset_skips_corrupt(wav_dir):
    (wav_dir / "bad.wav").write_bytes(b"not a wav at all")
    ds = AudioDataset(str(wav_dir), segment_length=8000, seed=0)
    for _ in range(8):
        seg, _ = ds.sample()
        assert seg.shape == (8000,)


def test_test_dataset_segments(wav_dir):
    ds = AudioTestDataset(str(wav_dir / "a0.wav"), segment_length=10000, overlap=0)
    segs = ds.segments_of(ds.raw_audio)
    assert segs.shape == (5, 10000)  # ceil(48000/10000) = 5
    # DC shift applied
    assert abs(ds.raw_audio.mean() - 1e-4) < 1e-6


def test_app_dataset_no_dc_shift(rng):
    """The in-memory AudioAppDataset must pass the caller's waveform through
    untouched: the reference's AudioAppDataset overrides read_audio with a
    no-op, so the file path's +1e-4-mean DC shift never applies
    (audio_dataset.py:187-205; regression — it was being applied here)."""
    from mdctgan_tpu.data.dataset import AudioAppDataset

    audio = (0.3 + 0.1 * rng.standard_normal(30000)).astype(np.float32)
    ds = AudioAppDataset(audio, 48000, segment_length=10000)
    np.testing.assert_array_equal(ds.raw_audio, audio)


def test_overlap_add_roundtrip(rng):
    """Unfold + edge-halve + fold reproduces the interior exactly when
    segments perfectly overlap-tile the signal."""
    seg_len, ov = 100, 20
    stride = seg_len - ov
    x = rng.standard_normal(stride * 7 + seg_len).astype(np.float32)
    idx = np.arange(8)[:, None] * stride + np.arange(seg_len)[None, :]
    segs = x[idx]
    out = overlap_add_segments(segs, seg_len, ov)
    # stitcher crops `ov` head/tail (generate_audio.py:50); every remaining
    # sample is covered by one full segment or a halved overlapping pair
    np.testing.assert_allclose(out, x[ov : ov + len(out)], atol=1e-5)


def test_short_clip_overlap_stitch_identity(rng):
    """A clip shorter than one segment yields ONE tail-padded segment (the
    reference pads no head there, audio_dataset.py:163-166), so stitch()
    must bypass the edge-halving overlap-add — which would attenuate the
    first `overlap` real samples and shift the clip (reference edge bug,
    fixed here; PARITY.md deviations)."""
    from mdctgan_tpu.data.dataset import AudioAppDataset

    seg, ov, n = 256, 32, 100
    audio = rng.standard_normal(n).astype(np.float32)
    ds = AudioAppDataset(audio, 48000, segment_length=seg, overlap=ov)
    segs = ds.segments_of(ds.raw_audio)
    assert segs.shape == (1, seg)
    out = ds.stitch(segs)
    np.testing.assert_array_equal(out[:n], audio)  # no attenuation, no shift
    np.testing.assert_array_equal(out[n:], 0)

    # long clips still route through the overlap-add fold
    long_audio = rng.standard_normal(3 * seg).astype(np.float32)
    ds2 = AudioAppDataset(long_audio, 48000, segment_length=seg, overlap=ov)
    segs2 = ds2.segments_of(ds2.raw_audio)
    np.testing.assert_allclose(
        ds2.stitch(segs2), overlap_add_segments(segs2, seg, ov), atol=0)


def test_stitch_branches_on_segmented_length_not_raw(rng):
    """stitch() must mirror the branch segments_of() actually took — decided
    by the SEGMENTED (resampled, hr-rate) signal's length — not by the raw
    input-rate length.  When input rate != hr rate the two lengths can
    straddle segment_length and the branches disagree (ADVICE r2: edge-halved
    lone segment, or naively concatenated overlapped segments)."""
    from mdctgan_tpu.data.dataset import AudioAppDataset

    seg, ov = 256, 32

    # Case A: raw clip longer than one segment, but its resampled version
    # (e.g. 48k raw -> 16k) is SHORTER -> one tail-padded segment that must
    # bypass the edge-halving overlap-add.
    raw = rng.standard_normal(3 * seg).astype(np.float32)
    ds = AudioAppDataset(raw, 48000, segment_length=seg, overlap=ov)
    resampled = rng.standard_normal(seg - 50).astype(np.float32)
    segs = ds.segments_of(resampled)
    assert segs.shape == (1, seg)
    out = ds.stitch(segs)
    np.testing.assert_array_equal(out[: len(resampled)], resampled)

    # Case B: raw clip shorter than one segment, but its upsampled version
    # (--is_lr_input, e.g. 16k raw -> 48k) spans several overlapped segments
    # -> MUST go through overlap-add, not reshape(-1) concatenation.
    raw2 = rng.standard_normal(seg - 50).astype(np.float32)
    ds2 = AudioAppDataset(raw2, 16000, segment_length=seg, overlap=ov)
    upsampled = rng.standard_normal(3 * seg).astype(np.float32)
    segs2 = ds2.segments_of(upsampled)
    assert segs2.shape[0] > 1
    np.testing.assert_allclose(
        ds2.stitch(segs2), overlap_add_segments(segs2, seg, ov), atol=0)


def test_input_pipeline(wav_dir):
    from mdctgan_tpu.data.pipeline import InputPipeline
    from mdctgan_tpu.ops.features import SpectralConfig

    cfg = SpectralConfig(
        n_fft=64, hop_length=32, win_length=64, segment_length=992,
        lr_sampling_rate=16000, hr_sampling_rate=48000,
    )
    ds = AudioDataset(str(wav_dir), segment_length=992, seed=0)
    pipe = InputPipeline(ds, cfg, batch_size=2, orig_freq=48000)
    try:
        batch = next(pipe)
        assert batch["lr_audio"].shape == (2, 992)
        assert batch["hr_audio"].shape == (2, 992)
        assert np.isfinite(np.asarray(batch["lr_audio"])).all()
    finally:
        pipe.close()


def test_serial_batches(wav_dir):
    ds = AudioDataset(str(wav_dir), segment_length=8000, seed=0, serial=True)
    # round-robin order over the sorted file list
    for _ in range(5):
        seg, _ = ds.sample()
        assert seg.shape == (8000,)
    assert ds._cursor == 5 % len(ds)


def test_mixed_sample_rate_pipeline(tmp_path):
    """Mixed-rate corpora: each item is degraded at its OWN rate (the
    reference resamples per item, audio_dataset.py:64-71).  Two files, each
    exactly segment_length frames at different native rates, so crops are
    deterministic and every emitted row must equal one of the two per-rate
    oracle rows."""
    from mdctgan_tpu.data.pipeline import InputPipeline, make_degrade_fn
    from mdctgan_tpu.ops.features import SpectralConfig
    import jax

    seglen = 992
    t48 = np.arange(seglen) / 48000.0
    t24 = np.arange(seglen) / 24000.0
    seg48 = (0.5 * np.sin(2 * np.pi * 440 * t48)).astype(np.float32)
    seg24 = (0.5 * np.sin(2 * np.pi * 220 * t24)).astype(np.float32)
    write_wav(str(tmp_path / "a48.wav"), seg48, sr=48000)
    write_wav(str(tmp_path / "b24.wav"), seg24, sr=24000)

    cfg = SpectralConfig(
        n_fft=64, hop_length=32, win_length=64, segment_length=seglen,
        lr_sampling_rate=16000, hr_sampling_rate=48000,
    )
    key = jax.random.PRNGKey(0)
    oracle = {}
    for fname, sr in (("a48.wav", 48000), ("b24.wav", 24000)):
        q, _ = native.read(str(tmp_path / fname))
        d = make_degrade_fn(cfg, sr, add_noise=False, snr=55.0)(
            np.asarray(q, np.float32)[None], key)
        oracle[sr] = {k: np.asarray(v[0]) for k, v in d.items()}

    ds = AudioDataset(str(tmp_path), segment_length=seglen, seed=3)
    pipe = InputPipeline(ds, cfg, batch_size=4, seed=3)
    try:
        seen = set()
        for _ in range(4):
            batch = next(pipe)
            for i in range(4):
                hr = np.asarray(batch["hr_audio"][i])
                lr = np.asarray(batch["lr_audio"][i])
                matched = None
                for sr, o in oracle.items():
                    if np.allclose(hr, o["hr_audio"], atol=1e-6) and \
                       np.allclose(lr, o["lr_audio"], atol=1e-6):
                        matched = sr
                assert matched is not None, "row matches neither rate's oracle"
                seen.add(matched)
        assert seen == {48000, 24000}, f"both rates should appear, got {seen}"
    finally:
        pipe.close()


def test_deterministic_eval_sampling(wav_dir):
    """--deterministic_eval: serial order + fixed per-file crop offsets ->
    two consecutive passes yield IDENTICAL batches (and differ from the
    default random-crop sampler's stream)."""
    ds = AudioDataset(str(wav_dir), segment_length=8000, seed=1,
                      serial=True, deterministic=True)
    a1, _ = ds.sample_batch(3)
    ds._cursor = 0
    a2, _ = ds.sample_batch(3)
    np.testing.assert_array_equal(a1, a2)

    rnd = AudioDataset(str(wav_dir), segment_length=8000, seed=1)
    b1, _ = rnd.sample_batch(3)
    b2, _ = rnd.sample_batch(3)
    assert not np.array_equal(b1, b2)


def test_wav_huge_fmt_chunk_rejected(tmp_path):
    """A corrupt WAV whose fmt-chunk size field is enormous must fail
    cleanly (allocation-capped), not attempt a multi-GiB zero-init."""
    p = tmp_path / "hugefmt.wav"
    import struct
    body = b"RIFF" + struct.pack("<I", 100) + b"WAVE"
    body += b"fmt " + struct.pack("<I", 0xFFFFFFF0) + b"\x00" * 16
    p.write_bytes(body)
    with pytest.raises(Exception):
        native.read(str(p))


def test_wav_absurd_channel_count_rejected(tmp_path):
    """65535 channels from a corrupt header must be rejected by the NATIVE
    decoder before the per-frame buffer allocation (the stdlib-wave Python
    fallback may still accept the file — only the C path allocates
    frames*channels*bps)."""
    import ctypes
    import struct
    p = tmp_path / "manych.wav"
    fmt = struct.pack("<HHIIHH", 1, 65535, 48000, 0xFFFFFFFF,
                      65535 * 2 & 0xFFFF, 16)
    data = b"\x00" * 64
    body = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p.write_bytes(body)
    lib = native.load_library()
    if lib is None:
        pytest.skip("native library unavailable")
    out = np.zeros(64, np.float32)
    sr = ctypes.c_uint32()
    rc = lib.audioio_read(
        str(p).encode(), 0, 64,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sr)
    assert rc != 0


def test_prefetcher_all_unreadable_raises_not_hangs(tmp_path):
    """A corpus where EVERY file is undecodable must surface as an error
    from next() within bounded time — not a silent infinite busy-spin."""
    bad1, bad2 = tmp_path / "a.wav", tmp_path / "b.wav"
    bad1.write_bytes(b"RIFF\x00\x00\x00\x00JUNK")
    bad2.write_bytes(b"garbage")
    if native.load_library() is None:
        pytest.skip("native library unavailable")
    pf = native.NativePrefetcher([str(bad1), str(bad2)], 1000,
                                 n_threads=2, queue_cap=4, seed=0)
    try:
        import time
        t0 = time.time()
        with pytest.raises(StopIteration):
            pf.next()
        assert time.time() - t0 < 30.0
    finally:
        pf.close()


def test_read_huge_offset_zero_pads(wav_dir):
    """A past-EOF (or wrapped) offset returns zeros, never wrong samples."""
    f = str(wav_dir / "a0.wav")
    seg, sr = native.read(f, offset=2**63, frames=64)
    assert seg.shape == (64,) and not seg.any()
