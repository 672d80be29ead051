// vorbisdec — Ogg/Vorbis decode via the system libvorbisfile, loaded with
// dlopen so libaudioio.so builds and runs on hosts without it (decode then
// reports unavailable and the corpus-level error names the format).
//
// TPU-native replacement for the reference's torchaudio sox_io ogg path
// (reference: data/audio_dataset.py:9,37 — sox decodes ogg/vorbis too).
// Mirrors the flacdec/mp3dec interface: whole-file decode to mono float32
// (channel 0, matching the reference's waveform[0] selection,
// audio_dataset.py:104).

#ifndef AUDIOIO_VORBIS_H_
#define AUDIOIO_VORBIS_H_

#include <cstddef>
#include <cstdint>
#include <vector>

namespace vorbisdec {

struct Info {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint64_t num_frames = 0;  // PCM frames (per channel)
};

// True once libvorbisfile has been dlopen'ed successfully (attempted
// lazily, at most once per process).
bool Available();

// Cheap magic sniff: an Ogg container ("OggS" capture pattern).  The
// container may hold a non-vorbis codec (opus/flac/theora) — ov_fopen then
// fails and the file is treated as undecodable, same as a corrupt file.
bool LooksLikeOgg(const uint8_t* p, size_t n);

// Probe without a full decode (ov_pcm_total reads the last page's
// granulepos): fills Info.
bool ProbeFile(const char* path, Info* info);

// Whole-file decode to mono float32 (channel 0).
bool DecodeMonoFile(const char* path, Info* info, std::vector<float>* mono);

}  // namespace vorbisdec

#endif  // AUDIOIO_VORBIS_H_
