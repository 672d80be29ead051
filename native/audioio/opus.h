// opusdec — Ogg/Opus decode via the system libopus + libogg (both dlopen'd
// so libaudioio.so builds and runs on hosts without them).
//
// TPU-native replacement for the reference's torchaudio sox_io opus path
// (reference: data/audio_dataset.py:9,37 — sox decodes ogg-contained opus;
// VoIP/speech corpora routinely ship as .opus).  Mirrors the
// flacdec/mp3dec/vorbisdec interface: whole-file decode to mono float32
// (channel 0, matching the reference's waveform[0] selection,
// audio_dataset.py:104).  Opus always decodes at 48 kHz; pre-skip and the
// final-page granulepos trim are applied per RFC 7845 §4.2/§5.
//
// Dispatch note: both vorbis and opus live in Ogg containers ("OggS"
// magic) — audioio.cc tries vorbis first (ov_fopen rejects opus streams
// cheaply) and falls back to this decoder.

#ifndef AUDIOIO_OPUS_H_
#define AUDIOIO_OPUS_H_

#include <cstddef>
#include <cstdint>
#include <vector>

namespace opusdec {

struct Info {
  uint32_t sample_rate = 0;  // always 48000 (the opus decode rate)
  uint32_t channels = 0;
  uint64_t num_frames = 0;   // PCM frames after pre-skip/end trim
};

// True once libopus AND libogg have been dlopen'ed successfully.
bool Available();

// Accurate probe WITHOUT opus decode: demux the Ogg pages, parse OpusHead,
// and read the final page's granulepos (RFC 7845 §5: granulepos counts
// 48 kHz samples including pre-skip).
bool ProbeFile(const char* path, Info* info);

// Whole-file decode to mono float32 (channel 0).
bool DecodeMonoFile(const char* path, Info* info, std::vector<float>* mono);

}  // namespace opusdec

#endif  // AUDIOIO_OPUS_H_
