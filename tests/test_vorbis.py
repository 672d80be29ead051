"""Ogg/Vorbis decode via the native layer (native/audioio/vorbis.cc +
libvorbisfile).

The reference decodes ogg through torchaudio's sox_io backend
(data/audio_dataset.py:9,37); this framework decodes it through the system
libvorbisfile, probed at runtime.  Fixtures are ENCODED here with the system
libvorbis/libvorbisenc/libogg via ctypes (test-only), so the round trip
crosses the encoder and decoder halves of two separately-loaded libraries.

Unlike mp3 (tests/test_mp3.py), vorbis is sample-exact: the stream's
granulepos trims the codec delay, so the decoded length equals the encoded
length and content aligns at lag 0.
"""

import ctypes
import os

import numpy as np
import pytest

from mdctgan_tpu.data import dataset as ds
from mdctgan_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.has_vorbis(), reason="libvorbisfile not available on this host")


class _OggPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.c_void_p), ("bytes", ctypes.c_long),
                ("b_o_s", ctypes.c_long), ("e_o_s", ctypes.c_long),
                ("granulepos", ctypes.c_int64), ("packetno", ctypes.c_int64)]


class _OggPage(ctypes.Structure):
    _fields_ = [("header", ctypes.c_void_p), ("header_len", ctypes.c_long),
                ("body", ctypes.c_void_p), ("body_len", ctypes.c_long)]


def encode_ogg(path, channels_data, sr=24000, quality=0.8):
    """Encode a list of per-channel float32 arrays to Ogg/Vorbis; returns
    False if the encoder libraries are unavailable.  Opaque libvorbis/libogg
    structs are oversized byte buffers — the libraries only ever see pointers
    to memory this function owns."""
    try:
        vorbis = ctypes.CDLL("libvorbis.so.0")
        venc = ctypes.CDLL("libvorbisenc.so.2")
        ogg = ctypes.CDLL("libogg.so.0")
    except OSError:
        return False

    vi = ctypes.create_string_buffer(512)     # vorbis_info
    vc = ctypes.create_string_buffer(512)     # vorbis_comment
    vd = ctypes.create_string_buffer(2048)    # vorbis_dsp_state
    vb = ctypes.create_string_buffer(2048)    # vorbis_block
    os_ = ctypes.create_string_buffer(2048)   # ogg_stream_state

    ch = len(channels_data)
    n = len(channels_data[0])
    vorbis.vorbis_info_init(vi)
    venc.vorbis_encode_init_vbr.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_float]
    if venc.vorbis_encode_init_vbr(vi, ch, sr, quality) != 0:
        return False
    vorbis.vorbis_comment_init(vc)
    assert vorbis.vorbis_analysis_init(vd, vi) == 0
    assert vorbis.vorbis_block_init(vd, vb) == 0
    assert ogg.ogg_stream_init(os_, 1) == 0

    out = []
    pg = _OggPage()

    def flush_pages(force):
        fn = ogg.ogg_stream_flush if force else ogg.ogg_stream_pageout
        while fn(os_, ctypes.byref(pg)) != 0:
            out.append(ctypes.string_at(pg.header, pg.header_len))
            out.append(ctypes.string_at(pg.body, pg.body_len))

    h1, h2, h3 = _OggPacket(), _OggPacket(), _OggPacket()
    assert vorbis.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(h1), ctypes.byref(h2), ctypes.byref(h3)) == 0
    for h in (h1, h2, h3):
        ogg.ogg_stream_packetin(os_, ctypes.byref(h))
    flush_pages(force=True)  # headers must end their own page

    vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float))

    def drain():
        op = _OggPacket()
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            assert vorbis.vorbis_analysis(vb, None) == 0
            assert vorbis.vorbis_bitrate_addblock(vb) == 0
            while vorbis.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                ogg.ogg_stream_packetin(os_, ctypes.byref(op))
                flush_pages(force=False)

    step = 1024
    for start in range(0, n, step):
        block = min(step, n - start)
        buf = vorbis.vorbis_analysis_buffer(vd, block)
        for c in range(ch):
            src = np.ascontiguousarray(
                channels_data[c][start:start + block], np.float32)
            ctypes.memmove(buf[c], src.ctypes.data, block * 4)
        assert vorbis.vorbis_analysis_wrote(vd, block) == 0
        drain()
    assert vorbis.vorbis_analysis_wrote(vd, 0) == 0  # EOS
    drain()
    flush_pages(force=True)

    ogg.ogg_stream_clear(os_)
    vorbis.vorbis_block_clear(vb)
    vorbis.vorbis_dsp_clear(vd)
    vorbis.vorbis_comment_clear(vc)
    vorbis.vorbis_info_clear(vi)
    with open(path, "wb") as f:
        f.write(b"".join(out))
    return True


def _sine(n, sr, hz, amp=0.5):
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _corr(a, b):
    m = min(len(a), len(b))
    a, b = a[:m], b[:m]
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return float(np.dot(a, b) / denom) if denom else 0.0


@pytest.fixture
def ogg_file(tmp_path):
    sr, n = 24000, 3 * 24000
    src = _sine(n, sr, 997.0)
    path = str(tmp_path / "tone.ogg")
    if not encode_ogg(path, [src], sr=sr):
        pytest.skip("libvorbisenc not available to build the fixture")
    return path, src, sr


def test_probe_and_full_decode(ogg_file):
    path, src, sr = ogg_file
    got_sr, ch, frames = native.info(path)
    assert got_sr == sr
    assert ch == 1
    assert frames == len(src)  # vorbis is sample-exact (granulepos trim)

    dec, got_sr2 = native.read(path)
    assert got_sr2 == sr
    assert len(dec) == len(src)
    assert _corr(dec, src) > 0.999, "decoded content does not match source"


def test_offset_read_and_eof_pad(ogg_file):
    path, src, _ = ogg_file
    full, _ = native.read(path)
    part, _ = native.read(path, offset=7000, frames=4096)
    np.testing.assert_array_equal(part, full[7000:7000 + 4096])
    tail, _ = native.read(path, offset=len(src) - 100, frames=300)
    assert np.all(tail[100:] == 0.0)


def test_stereo_takes_channel_zero(tmp_path):
    """The reference keeps waveform[0] (audio_dataset.py:104); vorbis hands
    back non-interleaved channel buffers — a channel-indexing bug would pick
    the wrong tone."""
    sr, n = 24000, 2 * 24000
    left, right = _sine(n, sr, 997.0), _sine(n, sr, 3001.0)
    path = str(tmp_path / "stereo.ogg")
    if not encode_ogg(path, [left, right], sr=sr):
        pytest.skip("libvorbisenc not available to build the fixture")
    _, ch, _ = native.info(path)
    assert ch == 2
    dec, _ = native.read(path)
    assert _corr(dec, left) > 0.99, "channel 0 should be the left tone"
    assert _corr(dec, right) < 0.5, "right tone leaked into channel 0"


def test_dataset_and_prefetcher_serve_ogg(ogg_file, tmp_path):
    path, _, sr = ogg_file
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


def test_without_vorbisfile_ogg_is_rejected_up_front(ogg_file, tmp_path,
                                                     monkeypatch):
    monkeypatch.setattr(native, "has_vorbis", lambda: False)
    with pytest.raises(FileNotFoundError, match="libvorbisfile"):
        ds.list_audio_files(str(tmp_path))


def test_corrupt_ogg_fails_decode_not_process(tmp_path):
    """Garbage behind an OggS magic (or a non-vorbis ogg stream) must return
    a decode error through the C ABI, never crash or fabricate audio."""
    lib = native.load_library()
    assert lib is not None
    for i, payload in enumerate((
            b"OggS" + b"\x00" * 64,
            b"OggS\x00\x02" + os.urandom(128),
    )):
        bad = tmp_path / f"bad{i}.ogg"
        bad.write_bytes(payload)
        out = np.empty(16, np.float32)
        sr = ctypes.c_uint32()
        rc = lib.audioio_read(
            str(bad).encode(), 0, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sr)
        assert rc != 0, f"payload {i}: corrupt ogg decoded with rc=0"
