"""MP3 decode via the native layer (native/audioio/mp3.cc + libmpg123).

The reference decodes mp3 through torchaudio's sox_io backend
(data/audio_dataset.py:9,37); this framework decodes it through the system
libmpg123, probed at runtime.  Fixtures are ENCODED here with the system
libmp3lame via ctypes (test-only), so the round trip exercises two
independent codecs — a decoder bug can't cancel against the encoder.

Lossy-codec facts the assertions account for: MP3 prepends an encoder/decoder
delay (~1–3k samples when no LAME gapless tag is written) and pads the final
frame, so content checks ALIGN by cross-correlation before comparing.
"""

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from mdctgan_tpu.data import dataset as ds
from mdctgan_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.has_mp3(), reason="libmpg123 not available on this host")


def _lame():
    for name in ("libmp3lame.so.0", "mp3lame"):
        try:
            return ctypes.CDLL(
                name if name.endswith(".so.0")
                else ctypes.util.find_library(name) or name)
        except OSError:
            continue
    return None


def encode_mp3(path, left, right=None, sr=24000, kbps=256):
    """Encode float32 [-1,1] PCM to mp3 with libmp3lame; returns False if
    lame is unavailable.  Stereo when ``right`` is given (mode STEREO, not
    joint — the channel-0 test needs L and R to stay distinct)."""
    lame = _lame()
    if lame is None:
        return False
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    ch = 2 if right is not None else 1
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, ch)
    lame.lame_set_brate(gfp, kbps)
    lame.lame_set_quality(gfp, 2)
    if ch == 2:
        lame.lame_set_mode(gfp, 0)  # 0 = STEREO (independent channels)
    if lame.lame_init_params(gfp) < 0:
        lame.lame_close(gfp)
        return False
    left = np.ascontiguousarray(left, np.float32)
    r = left if right is None else np.ascontiguousarray(right, np.float32)
    n = len(left)
    out = ctypes.create_string_buffer(n * 5 // 4 + 7200)
    fp = ctypes.POINTER(ctypes.c_float)
    wrote = lame.lame_encode_buffer_ieee_float(
        gfp, left.ctypes.data_as(fp), r.ctypes.data_as(fp), n, out, len(out))
    assert wrote >= 0, "lame encode failed"
    tail = ctypes.create_string_buffer(7200)
    wrote_tail = lame.lame_encode_flush(gfp, tail, len(tail))
    lame.lame_close(gfp)
    with open(path, "wb") as f:
        f.write(out.raw[:wrote])
        f.write(tail.raw[:max(wrote_tail, 0)])
    return True


def _sine(n, sr, hz, amp=0.5):
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _aligned_corr(dec, src):
    """Max normalized cross-correlation of src against dec over all lags
    (FFT-based), plus the argmax lag."""
    m = len(dec) + len(src)
    fd = np.fft.rfft(dec, m)
    fs = np.fft.rfft(src[::-1], m)
    xc = np.fft.irfft(fd * fs, m)
    lag = int(np.argmax(xc)) - (len(src) - 1)
    lo, hi = max(lag, 0), min(len(dec), lag + len(src))
    a = dec[lo:hi]
    b = src[lo - lag:hi - lag]
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return (float(np.dot(a, b) / denom) if denom else 0.0), lag


@pytest.fixture
def mp3_file(tmp_path):
    sr, n = 24000, 3 * 24000
    src = _sine(n, sr, 997.0)
    path = str(tmp_path / "tone.mp3")
    if not encode_mp3(path, src, sr=sr):
        pytest.skip("libmp3lame not available to build the fixture")
    return path, src, sr


def test_probe_and_full_decode(mp3_file):
    path, src, sr = mp3_file
    got_sr, ch, frames = native.info(path)
    assert got_sr == sr
    assert ch == 1
    # codec delay + final-frame padding: longer than the source, but bounded
    assert len(src) <= frames <= len(src) + 5000

    dec, got_sr2 = native.read(path)
    assert got_sr2 == sr
    corr, lag = _aligned_corr(dec, src)
    assert 0 <= lag <= 5000, f"implausible codec delay {lag}"
    assert corr > 0.995, f"decoded content does not match source: corr={corr}"


def test_offset_read_matches_full_decode(mp3_file):
    path, _, _ = mp3_file
    full, _ = native.read(path)
    part, _ = native.read(path, offset=7000, frames=4096)
    np.testing.assert_array_equal(part, full[7000:7000 + 4096])
    # past-EOF zero-pads, matching the WAV/FLAC contract
    tail, _ = native.read(path, offset=len(full) - 100, frames=300)
    assert np.all(tail[100:] == 0.0)


def test_stereo_takes_channel_zero(tmp_path):
    """The reference keeps waveform[0] (audio_dataset.py:104); an interleave
    bug would blend the distinct L/R tones."""
    sr, n = 24000, 2 * 24000
    left = _sine(n, sr, 997.0)
    right = _sine(n, sr, 3001.0)
    path = str(tmp_path / "stereo.mp3")
    if not encode_mp3(path, left, right, sr=sr):
        pytest.skip("libmp3lame not available to build the fixture")
    _, ch, _ = native.info(path)
    assert ch == 2
    dec, _ = native.read(path)
    corr_l, _ = _aligned_corr(dec, left)
    corr_r, _ = _aligned_corr(dec, right)
    assert corr_l > 0.99, f"channel 0 should be the left tone (corr={corr_l})"
    assert corr_r < 0.5, f"right tone leaked into channel 0 (corr={corr_r})"


def test_dataset_enumerates_and_samples_mp3(mp3_file, tmp_path):
    path, _, sr = mp3_file
    files = ds.list_audio_files(str(tmp_path))
    assert files == [path]
    d = ds.AudioDataset(str(tmp_path), segment_length=4096)
    seg, got_sr = d.sample()
    assert got_sr == sr
    assert seg.shape == (4096,)
    assert np.abs(seg).max() > 0.01  # real audio, not the zero pad


def test_prefetcher_serves_mp3(mp3_file):
    path, _, sr = mp3_file
    pf = native.NativePrefetcher([path], segment_frames=4096, n_threads=1,
                                 queue_cap=4, seed=7)
    try:
        for _ in range(4):
            seg, got_sr = pf.next()
            assert got_sr == sr
            assert seg.shape == (4096,)
            assert np.abs(seg).max() > 0.01
    finally:
        pf.close()


def test_without_mpg123_mp3_is_rejected_up_front(mp3_file, tmp_path,
                                                 monkeypatch):
    """On hosts without libmpg123 the old behavior survives: .mp3 is skipped
    at enumeration with an actionable message naming the missing library."""
    monkeypatch.setattr(native, "has_mp3", lambda: False)
    with pytest.raises(FileNotFoundError, match="libmpg123"):
        ds.list_audio_files(str(tmp_path))


def test_corrupt_mp3_fails_decode_not_process(tmp_path):
    """A tag-only/garbage .mp3 must return a decode error through the C ABI,
    never crash or hand back fabricated audio."""
    lib = native.load_library()
    assert lib is not None
    for i, payload in enumerate((
            b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 64,  # tag, no audio
            b"\xff\xfb" + os.urandom(64),                        # sync + junk
    )):
        bad = tmp_path / f"bad{i}.mp3"
        bad.write_bytes(payload)
        out = np.empty(16, np.float32)
        sr = ctypes.c_uint32()
        rc = lib.audioio_read(
            str(bad).encode(), 0, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sr)
        assert rc != 0, f"payload {i}: corrupt mp3 decoded with rc=0"
