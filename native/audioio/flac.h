// flac — native FLAC decoder for the audioio host input path.
//
// Replaces the torchaudio/sox FLAC decode the reference relies on for its
// canonical VCTK dataset (reference: data/audio_dataset.py:9,34-52 with
// data/compress_audio.sh converting the corpus wav->flac).  Implements the
// full subset real corpora use: STREAMINFO probing, fixed+variable blocking,
// CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, partitioned Rice
// residuals (methods 0 and 1 incl. escape partitions), wasted bits, and
// left-side / right-side / mid-side stereo decorrelation.

#ifndef AUDIOIO_FLAC_H_
#define AUDIOIO_FLAC_H_

#include <cstddef>
#include <cstdint>
#include <vector>

namespace flacdec {

struct Info {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t num_frames = 0;  // total samples per channel
};

// True if the buffer starts with the "fLaC" magic.
bool IsFlac(const uint8_t* data, size_t size);

// Parse the STREAMINFO metadata block.  Returns false on malformed input.
bool Probe(const uint8_t* data, size_t size, Info* info);

// Decode every frame; appends channel-0 samples (after stereo
// decorrelation — the reference's waveform[0] selection) scaled to
// [-1, 1) float32.  Returns false on malformed input.
bool DecodeMono(const uint8_t* data, size_t size, Info* info,
                std::vector<float>* out);

}  // namespace flacdec

#endif  // AUDIOIO_FLAC_H_
