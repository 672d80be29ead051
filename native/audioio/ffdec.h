// ffdec — m4a/aac/wma (and other container) decode via the system ffmpeg
// libraries (libavformat/libavcodec/libavutil, soname 59/59/57), loaded
// with dlopen so libaudioio.so builds and runs on hosts without them.
//
// TPU-native replacement for the last slice of the reference's torchaudio
// sox_io format surface (reference: data/audio_dataset.py:9,37).  Struct
// layouts come from the matching installed dev headers; every FUNCTION is
// resolved with dlsym at first use, so there is no link-time dependency —
// a host with a different ffmpeg major simply reports unavailable and the
// corpus-level error stays actionable.
//
// Mirrors the flacdec/mp3dec/vorbisdec/opusdec interface: whole-file
// decode to mono float32 (channel 0, audio_dataset.py:104).

#ifndef AUDIOIO_FFDEC_H_
#define AUDIOIO_FFDEC_H_

#include <cstddef>
#include <cstdint>
#include <vector>

namespace ffdec {

struct Info {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint64_t num_frames = 0;  // PCM frames (per channel), exact (counted)
};

// True once all three ffmpeg libraries have been dlopen'ed successfully.
bool Available();

// Magic/extension sniff for the formats routed here: MP4/M4A ("ftyp" at
// byte 4), ASF/WMA (GUID prefix 30 26 B2 75), raw ADTS AAC (0xFFF sync
// with layer bits 00 — disjoint from MPEG-audio's nonzero layer field),
// or a .m4a/.mp4/.aac/.wma path suffix.
bool LooksLikeFfmpegFormat(const uint8_t* p, size_t n, const char* path);

// Accurate probe: decodes the audio stream once and counts frames (the
// container's duration metadata can over/under-shoot; random-crop offsets
// need the true count).  O(file), cached by the callers like FLAC/mp3.
bool ProbeFile(const char* path, Info* info);

// Whole-file decode to mono float32 (channel 0).
bool DecodeMonoFile(const char* path, Info* info, std::vector<float>* mono);

}  // namespace ffdec

#endif  // AUDIOIO_FFDEC_H_
