// mp3dec — MPEG audio (mp3) decode via the system libmpg123, loaded with
// dlopen so libaudioio.so builds and runs on hosts without it (decode then
// reports unavailable and the corpus-level error names the format).
//
// TPU-native replacement for the reference's torchaudio sox_io mp3 path
// (reference: data/audio_dataset.py:9,37 — sox decodes anything including
// mp3; BWE corpora are routinely distributed as mp3).  Mirrors the flacdec
// interface: whole-file decode to mono float32 (channel 0, matching the
// reference's waveform[0] selection, audio_dataset.py:104).

#ifndef AUDIOIO_MP3_H_
#define AUDIOIO_MP3_H_

#include <cstddef>
#include <cstdint>
#include <vector>

namespace mp3dec {

struct Info {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint64_t num_frames = 0;  // PCM frames (per channel)
};

// True once libmpg123 has been dlopen'ed successfully (attempted lazily,
// at most once per process).
bool Available();

// Cheap magic sniff: ID3v2 tag or an MPEG frame sync in the first bytes.
// (Files with leading junk are caught by the path-suffix fallback at the
// dispatch sites — mpg123 itself resyncs past garbage.)
bool LooksLikeMp3(const uint8_t* p, size_t n);

// Accurate probe (mpg123_scan walks all frame headers): fills Info.
bool ProbeFile(const char* path, Info* info);

// Whole-file decode to mono float32 (channel 0).
bool DecodeMonoFile(const char* path, Info* info, std::vector<float>* mono);

}  // namespace mp3dec

#endif  // AUDIOIO_MP3_H_
