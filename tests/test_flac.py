"""Native C++ FLAC decoder (native/audioio/flac.cc) vs the pure-Python
encoder (mdctgan_tpu/data/flacenc.py).

FLAC is lossless: every encode->decode roundtrip must be bit-exact (int16
grid, decode scale 1/32768).  Covers the subframe types, stereo
decorrelation modes, offset reads, probing, and dataset integration the
reference gets from torchaudio/sox (data/audio_dataset.py:9,34-52; the
canonical VCTK corpus is FLAC via data/compress_audio.sh).
"""

import os

import numpy as np
import pytest

from mdctgan_tpu.data import native
from mdctgan_tpu.data.flacenc import write_flac

pytestmark = pytest.mark.skipif(
    native.load_library() is None, reason="native audioio library unavailable"
)


def _pcm(rng, n, ch=None, scale=3000):
    shape = (n,) if ch is None else (n, ch)
    # correlated-ish signal so fixed predictors actually help
    x = np.cumsum(rng.standard_normal(shape), axis=0)
    x = (scale * x / np.abs(x).max()).astype(np.int16)
    return x


def _roundtrip(tmp_path, pcm, sr=48000, **kw):
    path = os.path.join(tmp_path, "t.flac")
    write_flac(path, pcm, sr, **kw)
    mono = pcm if pcm.ndim == 1 else pcm[:, 0]
    data, got_sr = native.read(path)
    assert got_sr == sr
    np.testing.assert_array_equal(
        np.rint(np.asarray(data) * 32768.0).astype(np.int16), mono
    )
    return path


def test_info(tmp_path, rng):
    pcm = _pcm(rng, 10000)
    path = os.path.join(tmp_path, "t.flac")
    write_flac(path, pcm, 48000)
    sr, ch, nframes = native.info(path)
    assert (sr, ch, nframes) == (48000, 1, 10000)


@pytest.mark.parametrize("force", [None, "verbatim", "fixed0", "fixed1",
                                   "fixed2", "lpc2"])
def test_mono_roundtrip_subframe_types(tmp_path, rng, force):
    _roundtrip(str(tmp_path), _pcm(rng, 9000), force_subframe=force)


def test_constant_blocks(tmp_path, rng):
    pcm = np.full(8192, -123, np.int16)
    _roundtrip(str(tmp_path), pcm)
    _roundtrip(str(tmp_path), np.zeros(5000, np.int16))


def test_ragged_last_block(tmp_path, rng):
    _roundtrip(str(tmp_path), _pcm(rng, 4096 + 37))


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_stereo_decorrelation_returns_left(tmp_path, rng, mode):
    _roundtrip(str(tmp_path), _pcm(rng, 6000, ch=2), stereo_mode=mode)


def test_offset_read(tmp_path, rng):
    pcm = _pcm(rng, 12000)
    path = _roundtrip(str(tmp_path), pcm)
    data, _ = native.read(path, offset=5000, frames=2000)
    np.testing.assert_array_equal(
        np.rint(np.asarray(data) * 32768.0).astype(np.int16), pcm[5000:7000]
    )
    # past-EOF zero padding
    data, _ = native.read(path, offset=11000, frames=2000)
    assert np.all(np.asarray(data)[1000:] == 0)


def test_dataset_and_prefetcher_on_flac(tmp_path, rng):
    paths = []
    for i in range(3):
        p = os.path.join(str(tmp_path), f"s{i}.flac")
        write_flac(p, _pcm(rng, 9000), 48000)
        paths.append(os.path.basename(p))
    csv = os.path.join(str(tmp_path), "train.csv")
    with open(csv, "w") as f:
        f.write("\n".join(paths))

    from mdctgan_tpu.data.dataset import AudioDataset

    ds = AudioDataset(csv, segment_length=4000, seed=0)
    seg, sr = ds.sample()
    assert sr == 48000 and seg.shape == (4000,) and seg.std() > 0

    pf = native.NativePrefetcher(
        [os.path.join(str(tmp_path), p) for p in paths], 4000, n_threads=2
    )
    try:
        for _ in range(4):
            seg, sr = pf.next()
            assert sr == 48000 and seg.shape == (4000,)
    finally:
        pf.close()


def test_compress_audio_tool(tmp_path, rng):
    from mdctgan_tpu.data.flacenc import compress_audio

    x = 0.05 * rng.standard_normal(6000).astype(np.float32)
    native.write_wav16(os.path.join(str(tmp_path), "a.wav"), x, 16000)
    assert compress_audio(str(tmp_path)) == 1
    data, sr = native.read(os.path.join(str(tmp_path), "a.flac"))
    ref, _ = native.read(os.path.join(str(tmp_path), "a.wav"))
    assert sr == 16000
    np.testing.assert_array_equal(np.asarray(data), np.asarray(ref))


def test_decoder_rejects_malformed_inputs_without_crashing(tmp_path, rng):
    """Fuzz the native decode path: truncated/corrupt FLAC and WAV bytes and
    pure garbage must fail cleanly (exception or python fallback), never
    crash the process."""
    # a valid flac to mutate
    good = os.path.join(str(tmp_path), "good.flac")
    write_flac(good, _pcm(rng, 5000), 48000)
    base = open(good, "rb").read()

    cases = []
    for i in range(20):  # random truncations
        cases.append(base[: int(rng.integers(4, len(base)))])
    for i in range(20):  # random byte corruption (keep magic)
        b = bytearray(base)
        for _ in range(8):
            b[int(rng.integers(4, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for i in range(10):  # garbage with flac/wav magic
        cases.append(b"fLaC" + rng.bytes(int(rng.integers(0, 200))))
        cases.append(b"RIFF" + rng.bytes(int(rng.integers(0, 200))))
    for i in range(5):  # pure garbage
        cases.append(rng.bytes(int(rng.integers(0, 100))))

    path = os.path.join(str(tmp_path), "fuzz.bin")
    survived = 0
    for payload in cases:
        with open(path, "wb") as f:
            f.write(payload)
        try:
            native.info(path)
        except Exception:
            pass
        try:
            native.read(path, 0, 1000)
        except Exception:
            pass
        survived += 1
    assert survived == len(cases)
