"""Ogg/Opus decode via the native layer (native/audioio/opus.cc —
libogg demux + libopus decode, both dlopen'd).

The reference decodes opus through torchaudio's sox_io backend
(data/audio_dataset.py:9,37); speech corpora routinely ship as .opus.
Fixtures are ENCODED here with the system libopus + libogg via ctypes
(test-only): OpusHead/OpusTags headers, 20 ms packets, RFC 7845 granulepos
(pre-skip offset, end trim) — so the decoder's trim logic is exercised
against an independently-muxed stream.

Opus always decodes at 48 kHz regardless of the input rate (RFC 7845 §4).
"""

import ctypes
import struct

import numpy as np
import pytest

from mdctgan_tpu.data import dataset as ds
from mdctgan_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.has_opus(), reason="libopus/libogg not available on this host")

_FRAME = 960  # 20 ms at 48 kHz
_OPUS_APP_AUDIO = 2049
_OPUS_GET_LOOKAHEAD = 4027


class _OggPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.c_char_p), ("bytes", ctypes.c_long),
                ("b_o_s", ctypes.c_long), ("e_o_s", ctypes.c_long),
                ("granulepos", ctypes.c_int64), ("packetno", ctypes.c_int64)]


class _OggPage(ctypes.Structure):
    _fields_ = [("header", ctypes.c_void_p), ("header_len", ctypes.c_long),
                ("body", ctypes.c_void_p), ("body_len", ctypes.c_long)]


def encode_opus(path, channels_data, bitrate_unused=None):
    """Encode per-channel float32 arrays (48 kHz) to an Ogg/Opus file;
    returns False if the libraries are unavailable."""
    try:
        opus = ctypes.CDLL("libopus.so.0")
        ogg = ctypes.CDLL("libogg.so.0")
    except OSError:
        return False

    ch = len(channels_data)
    n = len(channels_data[0])
    err = ctypes.c_int()
    opus.opus_encoder_create.restype = ctypes.c_void_p
    enc = ctypes.c_void_p(
        opus.opus_encoder_create(48000, ch, _OPUS_APP_AUDIO,
                                 ctypes.byref(err)))
    if err.value != 0 or not enc:
        return False
    look = ctypes.c_int(0)
    opus.opus_encoder_ctl(enc, _OPUS_GET_LOOKAHEAD, ctypes.byref(look))
    pre_skip = look.value

    os_ = ctypes.create_string_buffer(2048)  # ogg_stream_state (oversized)
    assert ogg.ogg_stream_init(os_, 99) == 0
    out = []
    pg = _OggPage()

    def put(payload, granulepos, packetno, bos=0, eos=0, flush=True):
        pk = _OggPacket(packet=payload, bytes=len(payload), b_o_s=bos,
                        e_o_s=eos, granulepos=granulepos, packetno=packetno)
        ogg.ogg_stream_packetin(os_, ctypes.byref(pk))
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(os_, ctypes.byref(pg)) != 0:
            out.append(ctypes.string_at(pg.header, pg.header_len))
            out.append(ctypes.string_at(pg.body, pg.body_len))

    # RFC 7845 §5.1/§5.2 headers; each must end its own page (flush)
    head = (b"OpusHead" + bytes([1, ch]) + struct.pack("<H", pre_skip)
            + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0]))
    put(head, 0, 0, bos=1)
    vendor = b"audioio-test"
    tags = (b"OpusTags" + struct.pack("<I", len(vendor)) + vendor
            + struct.pack("<I", 0))
    put(tags, 0, 1)

    # interleave + pad to whole 20 ms frames
    data = np.stack([np.asarray(c, np.float32) for c in channels_data], 1)
    pad = (-n) % _FRAME
    if pad:
        data = np.concatenate([data, np.zeros((pad, ch), np.float32)])
    pcm = np.ascontiguousarray(data.reshape(-1))
    buf = ctypes.create_string_buffer(4000)
    n_frames = len(data) // _FRAME
    for k in range(n_frames):
        frame = pcm[k * _FRAME * ch:(k + 1) * _FRAME * ch]
        nb = opus.opus_encode_float(
            enc, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _FRAME, buf, len(buf))
        assert nb > 0, f"opus_encode_float failed: {nb}"
        last = k == n_frames - 1
        # granulepos counts 48 kHz samples INCLUDING pre-skip; the final
        # page's value trims the zero padding back off (RFC 7845 §4.2/§5)
        gp = pre_skip + (n if last else (k + 1) * _FRAME)
        put(buf.raw[:nb], gp, 2 + k, eos=1 if last else 0)
    opus.opus_encoder_destroy(enc)
    ogg.ogg_stream_clear(os_)
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
def opus_file(tmp_path):
    n = 2 * 48000 + 1234  # deliberately NOT a whole number of frames
    src = _sine(n, 48000, 997.0)
    path = str(tmp_path / "tone.opus")
    if not encode_opus(path, [src]):
        pytest.skip("libopus not available to build the fixture")
    return path, src


def test_probe_and_full_decode(opus_file):
    path, src = opus_file
    sr, ch, frames = native.info(path)
    assert sr == 48000
    assert ch == 1
    assert frames == len(src)  # pre-skip + granulepos end trim are exact

    dec, sr2 = native.read(path)
    assert sr2 == 48000
    assert len(dec) == len(src)
    # opus is lossy with a time-smeared onset: compare past the first frame
    assert _corr(dec[_FRAME:], src[_FRAME:]) > 0.98, \
        "decoded content does not match source"


def test_stereo_takes_channel_zero(tmp_path):
    n = 48000
    left, right = _sine(n, 48000, 997.0), _sine(n, 48000, 3301.0)
    path = str(tmp_path / "st.opus")
    if not encode_opus(path, [left, right]):
        pytest.skip("libopus not available to build the fixture")
    _, ch, frames = native.info(path)
    assert ch == 2 and frames == n
    dec, _ = native.read(path)
    assert _corr(dec[_FRAME:], left[_FRAME:]) > 0.95, \
        "channel 0 should be the left tone"
    assert _corr(dec[_FRAME:], right[_FRAME:]) < 0.5, \
        "right tone leaked into channel 0"


def test_dataset_and_prefetcher_serve_opus(opus_file, tmp_path):
    path, _ = opus_file
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


def test_without_libopus_opus_is_rejected_up_front(opus_file, tmp_path,
                                                   monkeypatch):
    monkeypatch.setattr(native, "has_opus", lambda: False)
    with pytest.raises(FileNotFoundError, match="libopus"):
        ds.list_audio_files(str(tmp_path))


def test_corrupt_opus_fails_decode_not_process(tmp_path):
    lib = native.load_library()
    assert lib is not None
    # an OpusHead that declares mapping family 1 (multistream) must be
    # rejected, not mis-decoded as a single stream
    for i, payload in enumerate((
            b"OggS" + b"\x00" * 100,
            b"OggS\x00\x02" + b"\xff" * 200,
    )):
        bad = tmp_path / f"bad{i}.opus"
        bad.write_bytes(payload)
        out = np.empty(16, np.float32)
        sr = ctypes.c_uint32()
        rc = lib.audioio_read(
            str(bad).encode(), 0, 16,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sr)
        assert rc != 0, f"payload {i}: corrupt opus decoded with rc=0"
