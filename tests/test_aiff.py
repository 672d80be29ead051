"""AIFF / AIFF-C decode (native/audioio/audioio.cc read_aiff_header +
decode_aiff_frames — big-endian PCM, built in like WAV).

The reference decodes aiff through torchaudio's sox_io backend
(data/audio_dataset.py:9,37).  AIFF is lossless, so unlike the mp3/ogg
tests these assert EXACT sample recovery.  Fixtures are constructed
byte-by-byte here (struct.pack big-endian), independent of any library.
"""

import ctypes
import struct

import numpy as np
import pytest

from mdctgan_tpu.data import dataset as ds
from mdctgan_tpu.data import native


def _ext80(rate: int) -> bytes:
    """80-bit IEEE extended encoding of a positive integer (the COMM
    sample-rate field): exponent biased 16383, explicit-integer-bit
    64-bit mantissa."""
    bl = rate.bit_length()
    mant = rate << (64 - bl)
    exp = 16383 + bl - 1
    return struct.pack(">HQ", exp, mant)


def _chunks(form_type: bytes, comm_body: bytes, sound: bytes) -> bytes:
    comm = b"COMM" + struct.pack(">I", len(comm_body)) + comm_body
    if len(comm_body) & 1:
        comm += b"\x00"
    ssnd_body = struct.pack(">II", 0, 0) + sound  # offset 0, blocksize 0
    ssnd = b"SSND" + struct.pack(">I", len(ssnd_body)) + ssnd_body
    payload = form_type + comm + ssnd
    return b"FORM" + struct.pack(">I", len(payload)) + payload


def write_aiff16(path, data, sr):
    """Classic AIFF, mono or stereo 16-bit big-endian PCM.  ``data`` is
    int16 of shape (frames,) or (frames, channels)."""
    data = np.asarray(data, np.int16)
    if data.ndim == 1:
        data = data[:, None]
    frames, ch = data.shape
    comm = struct.pack(">hIh", ch, frames, 16) + _ext80(sr)
    sound = data.astype(">i2").tobytes()
    with open(path, "wb") as f:
        f.write(_chunks(b"AIFF", comm, sound))


def write_aifc(path, data, sr, comp: bytes):
    """AIFF-C with compression type 'sowt' (LE16) or 'fl32' (BE float32)."""
    if comp == b"sowt":
        data = np.asarray(data, np.int16)[:, None]
        sound = data.astype("<i2").tobytes()
        bits = 16
    elif comp == b"fl32":
        data = np.asarray(data, np.float32)[:, None]
        sound = data.astype(">f4").tobytes()
        bits = 32
    else:
        raise ValueError(comp)
    frames = data.shape[0]
    # compression name as a pascal string, padded to even length
    name = b"\x04none\x00"
    comm = struct.pack(">hIh", 1, frames, bits) + _ext80(sr) + comp + name
    with open(path, "wb") as f:
        f.write(_chunks(b"AIFC", comm, sound))


def test_probe_and_exact_decode_mono16(tmp_path):
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, size=9000, dtype=np.int16)
    path = str(tmp_path / "tone.aiff")
    write_aiff16(path, pcm, 44100)
    sr, ch, frames = native.info(path)
    assert (sr, ch, frames) == (44100, 1, 9000)
    dec, sr2 = native.read(path)
    assert sr2 == 44100
    np.testing.assert_array_equal(dec, pcm.astype(np.float32) / 32768.0)


def test_stereo_takes_channel_zero_and_offset_read(tmp_path):
    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32768, size=(5000, 2), dtype=np.int16)
    path = str(tmp_path / "st.aif")
    write_aiff16(path, pcm, 48000)
    _, ch, frames = native.info(path)
    assert (ch, frames) == (2, 5000)
    dec, _ = native.read(path)
    np.testing.assert_array_equal(dec, pcm[:, 0].astype(np.float32) / 32768.0)
    part, _ = native.read(path, offset=1234, frames=256)
    np.testing.assert_array_equal(part, dec[1234:1490])
    tail, _ = native.read(path, offset=4990, frames=64)  # past-EOF zero-pad
    assert np.all(tail[10:] == 0.0)


def test_aifc_sowt_little_endian(tmp_path):
    rng = np.random.default_rng(2)
    pcm = rng.integers(-32768, 32768, size=4000, dtype=np.int16)
    path = str(tmp_path / "mac.aiff")
    write_aifc(path, pcm, 22050, b"sowt")
    sr, ch, frames = native.info(path)
    assert (sr, ch, frames) == (22050, 1, 4000)
    dec, _ = native.read(path)
    np.testing.assert_array_equal(dec, pcm.astype(np.float32) / 32768.0)


def test_aifc_fl32_float(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(4000).astype(np.float32) * 0.5
    path = str(tmp_path / "f.aiff")
    write_aifc(path, x, 16000, b"fl32")
    sr, ch, frames = native.info(path)
    assert (sr, ch, frames) == (16000, 1, 4000)
    dec, _ = native.read(path)
    np.testing.assert_array_equal(dec, x)


def test_dataset_and_prefetcher_serve_aiff(tmp_path):
    rng = np.random.default_rng(4)
    pcm = rng.integers(-20000, 20000, size=24000, dtype=np.int16)
    path = str(tmp_path / "a.aiff")
    write_aiff16(path, pcm, 48000)
    files = ds.list_audio_files(str(tmp_path))
    assert files == [path]
    d = ds.AudioDataset(str(tmp_path), segment_length=4096)
    seg, sr = d.sample()
    assert sr == 48000 and seg.shape == (4096,)
    assert np.abs(seg).max() > 0.01

    pf = native.NativePrefetcher([path], segment_frames=4096, n_threads=1,
                                 queue_cap=4, seed=7)
    try:
        seg, sr = pf.next()
        assert sr == 48000 and seg.shape == (4096,)
        assert np.abs(seg).max() > 0.01
    finally:
        pf.close()


def test_corrupt_and_compressed_aiff_fail_cleanly(tmp_path):
    lib = native.load_library()
    assert lib is not None
    # a compressed AIFC (ulaw) must be rejected, not mis-decoded as PCM
    comm = struct.pack(">hIh", 1, 100, 16) + _ext80(8000) + b"ulaw" + b"\x00\x00"
    payloads = [
        b"FORM" + struct.pack(">I", 20) + b"AIFF" + b"\x00" * 16,  # no COMM
        _chunks(b"AIFC", comm, b"\x00" * 200),                      # ulaw
        b"FORM\xff\xff\xff\xffAIFF" + b"COMM" + b"\xff" * 40,       # huge size
    ]
    for i, payload in enumerate(payloads):
        bad = tmp_path / f"bad{i}.aiff"
        bad.write_bytes(payload)
        out = np.empty(16, np.float32)
        sr = ctypes.c_uint32()
        rc = lib.audioio_read(
            str(bad).encode(), 0, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sr)
        assert rc != 0, f"payload {i}: bad aiff decoded with rc=0"
