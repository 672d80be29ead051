"""m4a / ADTS-AAC / wma decode via the native layer (native/audioio/
ffdec.cc — system ffmpeg 5.x, dlopen'd).

The reference decodes these through torchaudio's sox_io backend
(data/audio_dataset.py:9,37).  Fixtures are ENCODED by a test-only helper
(tests/fixtures/aacenc.cc, compiled here with g++ against the ffmpeg dev
headers) driving ffmpeg's ENCODER + MUXER — a different code path from the
demux+decode side under test.

AAC is lossy with encoder delay (~2048 samples, no gapless metadata in
ADTS), so content checks align by cross-correlation like the mp3 tests.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from mdctgan_tpu.data import dataset as ds
from mdctgan_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.has_ffmpeg(), reason="ffmpeg 5.x not available on this host")

_FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="module")
def aacenc():
    """Compile + load the test-only encoder helper; skip if the toolchain
    or ffmpeg dev files are missing."""
    so = os.path.join(_FIXDIR, "libaacenc.so")
    src = os.path.join(_FIXDIR, "aacenc.cc")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", src, "-o", so,
                 "-lavformat", "-lavcodec", "-lavutil"],
                check=True, capture_output=True, timeout=120)
        except Exception as e:
            pytest.skip(f"cannot build aac encode helper: {e}")
    lib = ctypes.CDLL(so)
    lib.aacenc_encode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.c_int]
    lib.aacenc_encode.restype = ctypes.c_int

    def encode(path, data, sr):
        """data: float32 (frames,) or (frames, channels), interleaved."""
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = data[:, None]
        flat = np.ascontiguousarray(data.reshape(-1))
        rc = lib.aacenc_encode(
            path.encode(), flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            data.shape[0], sr, data.shape[1])
        assert rc == 0, f"aacenc_encode failed rc={rc}"

    return encode


def _sine(n, sr, hz, amp=0.5):
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _aligned_corr(dec, src):
    m = len(dec) + len(src)
    fd = np.fft.rfft(dec, m)
    fs = np.fft.rfft(src[::-1], m)
    xc = np.fft.irfft(fd * fs, m)
    lag = int(np.argmax(xc)) - (len(src) - 1)
    lo, hi = max(lag, 0), min(len(dec), lag + len(src))
    a, b = dec[lo:hi], src[lo - lag:hi - lag]
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return (float(np.dot(a, b) / denom) if denom else 0.0), lag


@pytest.mark.parametrize("ext", [".m4a", ".aac"])
def test_probe_and_full_decode(aacenc, tmp_path, ext):
    sr, n = 24000, 3 * 24000
    src = _sine(n, sr, 997.0)
    path = str(tmp_path / f"tone{ext}")
    aacenc(path, src, sr)
    got_sr, ch, frames = native.info(path)
    assert got_sr == sr
    assert ch == 1
    # AAC pads with encoder delay + final-frame fill; ADTS carries no
    # gapless info so the decoded stream is LONGER than the source
    assert n <= frames <= n + 6000

    dec, got_sr2 = native.read(path)
    assert got_sr2 == sr
    corr, lag = _aligned_corr(dec, src)
    assert 0 <= lag <= 6000, f"implausible codec delay {lag}"
    assert corr > 0.98, f"decoded content does not match source: corr={corr}"


def test_stereo_takes_channel_zero(aacenc, tmp_path):
    sr, n = 24000, 2 * 24000
    left, right = _sine(n, sr, 997.0), _sine(n, sr, 3301.0)
    path = str(tmp_path / "st.m4a")
    aacenc(path, np.stack([left, right], 1), sr)
    _, ch, _ = native.info(path)
    assert ch == 2
    dec, _ = native.read(path)
    corr_l, _ = _aligned_corr(dec, left)
    corr_r, _ = _aligned_corr(dec, right)
    assert corr_l > 0.95, f"channel 0 should be the left tone ({corr_l})"
    assert corr_r < 0.5, f"right tone leaked into channel 0 ({corr_r})"


def test_dataset_and_prefetcher_serve_m4a(aacenc, tmp_path):
    sr = 24000
    path = str(tmp_path / "a.m4a")
    aacenc(path, _sine(24000, sr, 500.0), sr)
    files = ds.list_audio_files(str(tmp_path))
    assert files == [path]
    d = ds.AudioDataset(str(tmp_path), segment_length=4096)
    seg, got_sr = d.sample()
    assert got_sr == sr and seg.shape == (4096,)
    assert np.abs(seg).max() > 0.01

    pf = native.NativePrefetcher([path], segment_frames=4096, n_threads=1,
                                 queue_cap=4, seed=7)
    try:
        seg, got_sr = pf.next()
        assert got_sr == sr and seg.shape == (4096,)
        assert np.abs(seg).max() > 0.01
    finally:
        pf.close()


def test_without_ffmpeg_m4a_is_rejected_up_front(aacenc, tmp_path,
                                                 monkeypatch):
    path = str(tmp_path / "a.m4a")
    aacenc(path, _sine(8000, 24000, 500.0), 24000)
    monkeypatch.setattr(native, "has_ffmpeg", lambda: False)
    with pytest.raises(FileNotFoundError, match="ffmpeg"):
        ds.list_audio_files(str(tmp_path))


def test_corrupt_inputs_fail_decode_not_process(tmp_path):
    lib = native.load_library()
    assert lib is not None
    for i, (name, payload) in enumerate((
            ("bad.m4a", b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 64),
            ("bad.wma", bytes([0x30, 0x26, 0xB2, 0x75]) + os.urandom(128)),
            ("bad.aac", b"\xff\xf1" + os.urandom(64)),
    )):
        bad = tmp_path / name
        bad.write_bytes(payload)
        out = np.empty(16, np.float32)
        sr = ctypes.c_uint32()
        rc = lib.audioio_read(
            str(bad).encode(), 0, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sr)
        assert rc != 0, f"{name}: corrupt file decoded with rc=0"
