// audioio — native host-side audio decode + prefetch for the input pipeline.
//
// TPU-native replacement for the reference's torchaudio sox_io backend
// (reference: data/audio_dataset.py:9,34-52): WAV probing, random-offset
// segment reads, and a multi-threaded prefetching segment loader that keeps
// the host input pipeline off the Python GIL.  Exposed to Python via a plain
// C ABI consumed with ctypes (mdctgan_tpu/data/native.py).
//
// Supported containers: RIFF/WAVE with PCM 16/24/32-bit and IEEE float32,
// FLAC (flac.cc) — the reference's canonical VCTK corpus is FLAC
// (data/compress_audio.sh) — and MPEG audio/mp3 via the system libmpg123
// when present (mp3.cc), Ogg/Vorbis via the system libvorbisfile when
// present (vorbis.cc), Ogg/Opus via the system libopus+libogg when present
// (opus.cc), AIFF/AIFF-C big-endian PCM (built in, below), and m4a/aac/wma
// via the system ffmpeg libraries when present (ffdec.cc) — the full format
// surface the reference's sox_io backend decodes (data/audio_dataset.py:9,37).

#include <algorithm>
#include <atomic>
#include <cctype>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include "ffdec.h"
#include "flac.h"
#include "mp3.h"
#include "opus.h"
#include "vorbis.h"

namespace {

// mp3 dispatch: by magic (ID3 tag / MPEG frame sync), with a path-suffix
// fallback for mp3 files carrying leading junk mpg123 would resync past.
bool is_mp3(const char magic[8], const std::string& path) {
  if (mp3dec::LooksLikeMp3(reinterpret_cast<const uint8_t*>(magic), 4))
    return true;
  if (path.size() < 4) return false;
  std::string ext = path.substr(path.size() - 4);
  for (auto& c : ext) c = static_cast<char>(std::tolower(c));
  return ext == ".mp3";
}

bool read_all_bytes(std::FILE* f, std::vector<uint8_t>* buf) {
  if (std::fseek(f, 0, SEEK_END) != 0) return false;
  long sz = std::ftell(f);
  if (sz < 0 || std::fseek(f, 0, SEEK_SET) != 0) return false;
  buf->resize(static_cast<size_t>(sz));
  return std::fread(buf->data(), 1, buf->size(), f) == buf->size();
}

// 8 bytes: enough for every sniff here (MP4's "ftyp" sits at bytes 4-7).
bool file_magic(std::FILE* f, char magic[8]) {
  if (std::fread(magic, 1, 8, f) != 8) return false;
  return std::fseek(f, 0, SEEK_SET) == 0;
}

// Whole-file FLAC decode to mono float32 (channel 0).
bool decode_flac_file(std::FILE* f, flacdec::Info* info,
                      std::vector<float>* mono) {
  std::vector<uint8_t> bytes;
  if (!read_all_bytes(f, &bytes)) return false;
  return flacdec::DecodeMono(bytes.data(), bytes.size(), info, mono);
}

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits_per_sample = 0;
  uint16_t format = 0;  // 1 = PCM, 3 = IEEE float
  uint64_t num_frames = 0;
  uint64_t data_offset = 0;  // byte offset of sample data
};

bool read_wav_header(std::FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) != 0)
    return false;
  if (std::fread(&riff_size, 4, 1, f) != 1) return false;
  if (std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4) != 0)
    return false;
  bool have_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1)
      return false;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      // fmt chunks are tens of bytes in real files — a corrupt size field
      // must not drive a multi-GiB zero-init allocation (the FLAC path got
      // the same corrupt-input caps earlier)
      if (size < 16 || size > (1u << 20)) return false;
      std::vector<uint8_t> buf(size);
      if (std::fread(buf.data(), 1, size, f) != size) return false;
      auto rd16 = [&](size_t off) {
        uint16_t v;
        std::memcpy(&v, &buf[off], 2);  // unaligned-safe (decode_frames idiom)
        return v;
      };
      uint32_t v32;
      std::memcpy(&v32, &buf[4], 4);
      info->format = rd16(0);
      info->channels = rd16(2);
      info->sample_rate = v32;
      info->bits_per_sample = rd16(14);
      if (info->format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        info->format = rd16(24);
      }
      have_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0) {
      // Byte-aligned samples only; a sub-byte bits_per_sample (e.g. ADPCM
      // headers) would make the frame size 0 and divide by zero below.
      // Channel count capped: a corrupt header's 65535 channels would make
      // decode_frames allocate frames*channels*bps.
      if (!have_fmt || info->channels == 0 || info->channels > 256 ||
          info->bits_per_sample == 0 || info->bits_per_sample % 8 != 0)
        return false;
      info->data_offset = static_cast<uint64_t>(std::ftell(f));
      info->num_frames = size / (info->channels * info->bits_per_sample / 8);
      return info->format == 1 || info->format == 3;
    } else {
      if (std::fseek(f, static_cast<long>(size + (size & 1)), SEEK_CUR) != 0)
        return false;
    }
  }
}

// Decode `frames` frames starting at `offset` into mono float32 (channel 0,
// matching the reference's waveform[0] selection, audio_dataset.py:104).
bool decode_frames(std::FILE* f, const WavInfo& info, uint64_t offset,
                   uint64_t frames, float* out) {
  const uint32_t bps = info.bits_per_sample / 8;
  const uint32_t frame_bytes = bps * info.channels;
  if (offset >= info.num_frames) {
    // fully past EOF (incl. huge/wrapped offsets): the documented zero-pad,
    // without letting offset*frame_bytes overflow into a bogus fseek
    std::fill(out, out + frames, 0.0f);
    return true;
  }
  if (std::fseek(f, static_cast<long>(info.data_offset + offset * frame_bytes),
                 SEEK_SET) != 0)
    return false;
  std::vector<uint8_t> buf(frames * frame_bytes);
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  uint64_t got_frames = got / frame_bytes;
  for (uint64_t i = 0; i < frames; ++i) {
    if (i >= got_frames) {
      out[i] = 0.0f;
      continue;
    }
    const uint8_t* p = &buf[i * frame_bytes];  // channel 0
    if (info.format == 3 && info.bits_per_sample == 32) {
      float v;
      std::memcpy(&v, p, 4);
      out[i] = v;
    } else if (info.bits_per_sample == 16) {
      int16_t v;
      std::memcpy(&v, p, 2);
      out[i] = static_cast<float>(v) / 32768.0f;
    } else if (info.bits_per_sample == 24) {
      int32_t v = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
      out[i] = static_cast<float>(v >> 8) / 8388608.0f;
    } else if (info.bits_per_sample == 32 && info.format == 1) {
      int32_t v;
      std::memcpy(&v, p, 4);
      out[i] = static_cast<float>(v) / 2147483648.0f;
    } else {
      return false;
    }
  }
  return true;
}

// ------------------------------------------------------------------------
// AIFF / AIFF-C: big-endian PCM in an IFF container (the remaining
// UNCOMPRESSED format the reference's sox backend reads,
// data/audio_dataset.py:9,37).  Random access is frame-exact like WAV.
// Supported: AIFF PCM 8/16/24/32, AIFC "NONE"/"twos" (big-endian PCM),
// "sowt" (little-endian 16-bit, the Mac/QuickTime variant), "fl32"/"FL32"
// (big-endian float32).
// ------------------------------------------------------------------------

uint16_t be16(const uint8_t* p) {
  return static_cast<uint16_t>((p[0] << 8) | p[1]);
}
uint32_t be32(const uint8_t* p) {
  return (static_cast<uint32_t>(p[0]) << 24) |
         (static_cast<uint32_t>(p[1]) << 16) |
         (static_cast<uint32_t>(p[2]) << 8) | p[3];
}

// COMM's sample rate is an 80-bit IEEE 754 extended-precision float:
// sign(1) | exponent(15, bias 16383) | mantissa(64, explicit integer bit).
double read_extended80(const uint8_t p[10]) {
  const int sign = (p[0] & 0x80) ? -1 : 1;
  const int exp = ((p[0] & 0x7F) << 8) | p[1];
  uint64_t mant = 0;
  for (int i = 2; i < 10; ++i) mant = (mant << 8) | p[i];
  if (exp == 0 && mant == 0) return 0.0;
  if (exp == 0x7FFF) return 0.0;  // inf/nan: treat as invalid
  return sign * std::ldexp(static_cast<double>(mant), exp - 16383 - 63);
}

struct AiffInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits_per_sample = 0;
  bool little_endian = false;  // AIFC "sowt"
  bool is_float = false;       // AIFC "fl32"/"FL32"
  uint64_t num_frames = 0;
  uint64_t data_offset = 0;
};

bool read_aiff_header(std::FILE* f, AiffInfo* info) {
  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12) return false;
  if (std::memcmp(hdr, "FORM", 4) != 0) return false;
  const bool aifc = std::memcmp(hdr + 8, "AIFC", 4) == 0;
  if (!aifc && std::memcmp(hdr + 8, "AIFF", 4) != 0) return false;
  bool have_comm = false;
  while (true) {
    uint8_t ch[8];
    if (std::fread(ch, 1, 8, f) != 8) return false;
    const uint32_t size = be32(ch + 4);
    if (std::memcmp(ch, "COMM", 4) == 0) {
      // COMM is 18 bytes (AIFC: +4CC compression type + pstring name); a
      // corrupt size must not drive a huge allocation (WAV fmt idiom).
      if (size < 18 || size > (1u << 20)) return false;
      std::vector<uint8_t> buf(size);
      if (std::fread(buf.data(), 1, size, f) != size) return false;
      if (size & 1) {
        if (std::fseek(f, 1, SEEK_CUR) != 0) return false;
      }
      info->channels = be16(&buf[0]);
      info->num_frames = be32(&buf[2]);
      info->bits_per_sample = be16(&buf[6]);
      const double rate = read_extended80(&buf[8]);
      if (rate <= 0 || rate > 4e9) return false;
      info->sample_rate = static_cast<uint32_t>(rate + 0.5);
      if (aifc) {
        if (size < 22) return false;
        const uint8_t* comp = &buf[18];
        if (std::memcmp(comp, "NONE", 4) == 0 ||
            std::memcmp(comp, "twos", 4) == 0) {
          // big-endian PCM (the default)
        } else if (std::memcmp(comp, "sowt", 4) == 0) {
          info->little_endian = true;
        } else if (std::memcmp(comp, "fl32", 4) == 0 ||
                   std::memcmp(comp, "FL32", 4) == 0) {
          info->is_float = true;
        } else {
          return false;  // compressed AIFC (ulaw/ima4/...) not supported
        }
      }
      have_comm = true;
    } else if (std::memcmp(ch, "SSND", 4) == 0) {
      if (!have_comm || info->channels == 0 || info->channels > 256 ||
          info->bits_per_sample == 0 || info->bits_per_sample % 8 != 0)
        return false;
      if (info->is_float && info->bits_per_sample != 32) return false;
      if (info->little_endian && info->bits_per_sample != 16) return false;
      uint8_t ss[8];
      if (size < 8 || std::fread(ss, 1, 8, f) != 8) return false;
      const uint32_t pad = be32(ss);  // offset into the sound data
      const uint32_t frame_bytes =
          info->channels * info->bits_per_sample / 8;
      if (pad > size - 8) return false;
      info->data_offset = static_cast<uint64_t>(std::ftell(f)) + pad;
      // COMM's frame count is authoritative but must not outrun the chunk
      const uint64_t chunk_frames = (size - 8 - pad) / frame_bytes;
      info->num_frames = std::min<uint64_t>(info->num_frames, chunk_frames);
      return true;
    } else {
      if (std::fseek(f, static_cast<long>(size + (size & 1)), SEEK_CUR) != 0)
        return false;
    }
  }
}

// Decode `frames` frames at `offset` into mono float32 (channel 0).
bool decode_aiff_frames(std::FILE* f, const AiffInfo& info, uint64_t offset,
                        uint64_t frames, float* out) {
  const uint32_t bps = info.bits_per_sample / 8;
  const uint32_t frame_bytes = bps * info.channels;
  if (offset >= info.num_frames) {
    std::fill(out, out + frames, 0.0f);
    return true;
  }
  if (std::fseek(f, static_cast<long>(info.data_offset + offset * frame_bytes),
                 SEEK_SET) != 0)
    return false;
  const uint64_t avail = info.num_frames - offset;
  std::vector<uint8_t> buf(std::min<uint64_t>(frames, avail) * frame_bytes);
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  uint64_t got_frames = got / frame_bytes;
  for (uint64_t i = 0; i < frames; ++i) {
    if (i >= got_frames) {
      out[i] = 0.0f;
      continue;
    }
    const uint8_t* p = &buf[i * frame_bytes];  // channel 0
    if (info.is_float) {
      const uint32_t bits = be32(p);
      float v;
      std::memcpy(&v, &bits, 4);
      out[i] = v;
    } else if (info.bits_per_sample == 16) {
      const int16_t v = info.little_endian
                            ? static_cast<int16_t>(p[0] | (p[1] << 8))
                            : static_cast<int16_t>((p[0] << 8) | p[1]);
      out[i] = static_cast<float>(v) / 32768.0f;
    } else if (info.bits_per_sample == 24) {
      int32_t v = (p[0] << 24) | (p[1] << 16) | (p[2] << 8);
      out[i] = static_cast<float>(v >> 8) / 8388608.0f;
    } else if (info.bits_per_sample == 32) {
      out[i] = static_cast<float>(static_cast<int32_t>(be32(p))) /
               2147483648.0f;
    } else if (info.bits_per_sample == 8) {
      out[i] = static_cast<float>(static_cast<int8_t>(p[0])) / 128.0f;
    } else {
      return false;
    }
  }
  return true;
}

// ------------------------------------------------------------------------
// Prefetching segment loader: worker threads draw (file, offset) samples and
// fill a bounded queue of decoded segments.
// ------------------------------------------------------------------------

struct Segment {
  std::vector<float> data;
  uint32_t sample_rate;
};

class Prefetcher {
 public:
  Prefetcher(std::vector<std::string> files, uint64_t segment_frames,
             int n_threads, int queue_cap, uint64_t seed)
      : files_(std::move(files)),
        segment_frames_(segment_frames),
        cap_(queue_cap < 1 ? 1 : static_cast<size_t>(queue_cap)),
        stop_(false) {
    // At least one worker and one queue slot, or Next() blocks forever (the
    // reference's nThreads=0 means "load synchronously", not "never load").
    if (n_threads < 1) n_threads = 1;
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this, seed, i] { Work(seed + i); });
    }
  }

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    not_full_.notify_all();
    not_empty_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocking pop; returns false on shutdown.
  bool Next(float* out, uint32_t* sample_rate) {
    std::unique_lock<std::mutex> lk(mu_);
    not_empty_.wait(lk, [this] { return stop_ || !queue_.empty(); });
    if (queue_.empty()) return false;
    Segment seg = std::move(queue_.front());
    queue_.pop();
    lk.unlock();
    not_full_.notify_one();
    std::memcpy(out, seg.data.data(), seg.data.size() * sizeof(float));
    *sample_rate = seg.sample_rate;
    return true;
  }

 private:
  void Work(uint64_t seed) {
    std::mt19937_64 rng(seed);
    std::uniform_int_distribution<size_t> pick(0, files_.size() - 1);
    // Skip-on-failure must not become a silent infinite 100%-CPU spin when
    // EVERY file is unreadable (wrong --dataroot, corrupt corpus): after a
    // full corpus' worth of consecutive failures, shut the queue down so
    // Next() returns false and the Python side raises.
    const uint64_t max_streak = 4 * files_.size() + 64;
    uint64_t fail_streak = 0;
    while (true) {
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stop_) return;
      }
      size_t idx = pick(rng);
      Segment seg;
      bool ok = false;
      try {
        seg.data.assign(segment_frames_, 0.0f);
        std::FILE* f = std::fopen(files_[idx].c_str(), "rb");
        if (f) {  // else: skip unreadable files (audio_dataset.py:56-65)
          // random segment from a whole-file mono decode (FLAC and mp3
          // have no cheap frame-accurate random access, unlike WAV)
          auto take_segment = [&](const std::vector<float>& mono,
                                  uint32_t rate) {
            uint64_t n = mono.size();
            uint64_t max_start = n > segment_frames_ ? n - segment_frames_ : 0;
            uint64_t off = max_start
                ? std::uniform_int_distribution<uint64_t>(0, max_start)(rng)
                : 0;
            uint64_t copy =
                n > off ? std::min<uint64_t>(n - off, segment_frames_) : 0;
            std::memcpy(seg.data.data(), mono.data() + off,
                        copy * sizeof(float));
            seg.sample_rate = rate;
          };
          char magic[8];
          bool have_magic = file_magic(f, magic);
          if (have_magic && std::memcmp(magic, "fLaC", 4) == 0) {
            flacdec::Info finfo;
            std::vector<float> mono;
            ok = decode_flac_file(f, &finfo, &mono);
            if (ok) take_segment(mono, finfo.sample_rate);
          } else if (have_magic &&
                     vorbisdec::LooksLikeOgg(
                         reinterpret_cast<const uint8_t*>(magic), 4)) {
            vorbisdec::Info vinfo;
            std::vector<float> mono;
            ok = vorbisdec::DecodeMonoFile(files_[idx].c_str(), &vinfo, &mono);
            if (ok) {
              take_segment(mono, vinfo.sample_rate);
            } else {
              opusdec::Info oinfo;
              ok = opusdec::DecodeMonoFile(files_[idx].c_str(), &oinfo, &mono);
              if (ok) take_segment(mono, oinfo.sample_rate);
            }
          } else if (have_magic && is_mp3(magic, files_[idx])) {
            mp3dec::Info minfo;
            std::vector<float> mono;
            ok = mp3dec::DecodeMonoFile(files_[idx].c_str(), &minfo, &mono);
            if (ok) take_segment(mono, minfo.sample_rate);
          } else if (have_magic && std::memcmp(magic, "FORM", 4) == 0) {
            AiffInfo ainfo;
            ok = read_aiff_header(f, &ainfo);
            if (ok) {
              uint64_t max_start = ainfo.num_frames > segment_frames_
                                       ? ainfo.num_frames - segment_frames_
                                       : 0;
              uint64_t off = max_start
                  ? std::uniform_int_distribution<uint64_t>(0, max_start)(rng)
                  : 0;
              ok = decode_aiff_frames(f, ainfo, off, segment_frames_,
                                      seg.data.data());
              seg.sample_rate = ainfo.sample_rate;
            }
          } else if (have_magic &&
                     ffdec::LooksLikeFfmpegFormat(
                         reinterpret_cast<const uint8_t*>(magic), 8,
                         files_[idx].c_str())) {
            ffdec::Info finfo2;
            std::vector<float> mono;
            ok = ffdec::DecodeMonoFile(files_[idx].c_str(), &finfo2, &mono);
            if (ok) take_segment(mono, finfo2.sample_rate);
          } else {
            WavInfo info;
            ok = read_wav_header(f, &info);
            if (ok) {
              uint64_t max_start = info.num_frames > segment_frames_
                                       ? info.num_frames - segment_frames_
                                       : 0;
              uint64_t off = max_start
                  ? std::uniform_int_distribution<uint64_t>(0, max_start)(rng)
                  : 0;
              ok = decode_frames(f, info, off, segment_frames_,
                                 seg.data.data());
              seg.sample_rate = info.sample_rate;
            }
          }
          std::fclose(f);
        }
      } catch (...) {
        // bad_alloc from a corrupt header etc. must skip the file, never
        // std::terminate the worker thread (and with it the whole process)
        ok = false;
      }
      if (!ok) {
        if (++fail_streak >= max_streak) {
          std::lock_guard<std::mutex> lk(mu_);
          stop_ = true;
          not_empty_.notify_all();
          not_full_.notify_all();
          return;
        }
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
        continue;
      }
      fail_streak = 0;
      std::unique_lock<std::mutex> lk(mu_);
      not_full_.wait(lk, [this] { return stop_ || queue_.size() < cap_; });
      if (stop_) return;
      queue_.push(std::move(seg));
      lk.unlock();
      not_empty_.notify_one();
    }
  }

  std::vector<std::string> files_;
  uint64_t segment_frames_;
  size_t cap_;
  bool stop_;
  std::mutex mu_;
  std::condition_variable not_empty_, not_full_;
  std::queue<Segment> queue_;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

// 1 when mp3 decode is available (system libmpg123 loaded), else 0.  The
// Python side uses this to decide whether .mp3 counts as a supported
// extension for corpus enumeration.
int audioio_has_mp3() { return mp3dec::Available() ? 1 : 0; }

// 1 when Ogg/Vorbis decode is available (system libvorbisfile loaded).
int audioio_has_vorbis() { return vorbisdec::Available() ? 1 : 0; }

// 1 when Ogg/Opus decode is available (system libopus + libogg loaded).
int audioio_has_opus() { return opusdec::Available() ? 1 : 0; }

// 1 when m4a/aac/wma decode is available (system ffmpeg 5.x loaded).
int audioio_has_ffmpeg() { return ffdec::Available() ? 1 : 0; }

// Probe: returns 0 on success and fills (sample_rate, channels, num_frames).
int audioio_info(const char* path, uint32_t* sample_rate, uint32_t* channels,
                 uint64_t* num_frames) try {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  // Zero-init: when file_magic() fails (file < 8 bytes / seek error) the
  // later sniff branches still read `magic`; zeros match no format, so
  // dispatch falls through to the WAV header read which fails cleanly.
  char magic[8] = {0};
  if (file_magic(f, magic) && std::memcmp(magic, "fLaC", 4) == 0) {
    // Probe needs only the metadata blocks (STREAMINFO is first and
    // mandatory): try a bounded prefix so probing a corpus costs O(files),
    // not O(corpus bytes); fall back to the whole file for the rare stream
    // whose metadata (e.g. embedded artwork) exceeds the prefix.
    std::vector<uint8_t> bytes(1u << 16);
    size_t got = std::fread(bytes.data(), 1, bytes.size(), f);
    bytes.resize(got);
    flacdec::Info info;
    bool ok = flacdec::Probe(bytes.data(), bytes.size(), &info);
    if (!ok) {
      if (std::fseek(f, 0, SEEK_SET) == 0 && read_all_bytes(f, &bytes))
        ok = flacdec::Probe(bytes.data(), bytes.size(), &info);
    }
    std::fclose(f);
    if (!ok) return -2;
    *sample_rate = info.sample_rate;
    *channels = info.channels;
    *num_frames = info.num_frames;
    return 0;
  }
  if (vorbisdec::LooksLikeOgg(reinterpret_cast<const uint8_t*>(magic), 4)) {
    std::fclose(f);
    // an Ogg container holds vorbis or opus: vorbis first (ov_fopen
    // rejects non-vorbis streams cheaply), opus as the fallback
    vorbisdec::Info info;
    if (vorbisdec::ProbeFile(path, &info)) {
      *sample_rate = info.sample_rate;
      *channels = info.channels;
      *num_frames = info.num_frames;
      return 0;
    }
    opusdec::Info oinfo;
    if (!opusdec::ProbeFile(path, &oinfo)) return -2;
    *sample_rate = oinfo.sample_rate;
    *channels = oinfo.channels;
    *num_frames = oinfo.num_frames;
    return 0;
  }
  if (std::memcmp(magic, "FORM", 4) == 0) {
    AiffInfo info;
    bool ok = read_aiff_header(f, &info);
    std::fclose(f);
    if (!ok) return -2;
    *sample_rate = info.sample_rate;
    *channels = info.channels;
    *num_frames = info.num_frames;
    return 0;
  }
  if (is_mp3(magic, path)) {
    std::fclose(f);
    mp3dec::Info info;
    if (!mp3dec::ProbeFile(path, &info)) return -2;
    *sample_rate = info.sample_rate;
    *channels = info.channels;
    *num_frames = info.num_frames;
    return 0;
  }
  if (ffdec::LooksLikeFfmpegFormat(
          reinterpret_cast<const uint8_t*>(magic), 8, path)) {
    std::fclose(f);
    ffdec::Info finfo;
    if (!ffdec::ProbeFile(path, &finfo)) return -2;
    *sample_rate = finfo.sample_rate;
    *channels = finfo.channels;
    *num_frames = finfo.num_frames;
    return 0;
  }
  WavInfo info;
  bool ok = read_wav_header(f, &info);
  std::fclose(f);
  if (!ok) return -2;
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  *num_frames = info.num_frames;
  return 0;
} catch (...) {
  return -3;  // never let bad_alloc cross the C ABI into ctypes
}

// Decode `frames` mono-float32 frames at `offset`; zero-pads past EOF.
int audioio_read(const char* path, uint64_t offset, uint64_t frames,
                 float* out, uint32_t* sample_rate) try {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[8] = {0};  // see audioio_info: failed sniff must not read garbage
  if (file_magic(f, magic) && std::memcmp(magic, "fLaC", 4) == 0) {
    flacdec::Info info;
    std::vector<float> mono;
    bool ok = decode_flac_file(f, &info, &mono);
    std::fclose(f);
    if (!ok) return -2;
    uint64_t n = mono.size();
    for (uint64_t i = 0; i < frames; ++i)
      // offset >= n first: a huge/wrapped offset must zero-pad, not let
      // offset + i wrap back under n and read the wrong samples
      out[i] = (offset < n && i < n - offset) ? mono[offset + i] : 0.0f;
    *sample_rate = info.sample_rate;
    return 0;
  }
  if (vorbisdec::LooksLikeOgg(reinterpret_cast<const uint8_t*>(magic), 4)) {
    std::fclose(f);
    vorbisdec::Info info;
    std::vector<float> mono;
    uint32_t rate = 0;
    if (vorbisdec::DecodeMonoFile(path, &info, &mono)) {
      rate = info.sample_rate;
    } else {
      opusdec::Info oinfo;
      if (!opusdec::DecodeMonoFile(path, &oinfo, &mono)) return -2;
      rate = oinfo.sample_rate;
    }
    uint64_t n = mono.size();
    for (uint64_t i = 0; i < frames; ++i)
      out[i] = (offset < n && i < n - offset) ? mono[offset + i] : 0.0f;
    *sample_rate = rate;
    return 0;
  }
  if (std::memcmp(magic, "FORM", 4) == 0) {
    AiffInfo info;
    bool ok = read_aiff_header(f, &info);
    if (ok) ok = decode_aiff_frames(f, info, offset, frames, out);
    std::fclose(f);
    if (!ok) return -2;
    *sample_rate = info.sample_rate;
    return 0;
  }
  if (is_mp3(magic, path)) {
    std::fclose(f);
    mp3dec::Info info;
    std::vector<float> mono;
    if (!mp3dec::DecodeMonoFile(path, &info, &mono)) return -2;
    uint64_t n = mono.size();
    for (uint64_t i = 0; i < frames; ++i)
      out[i] = (offset < n && i < n - offset) ? mono[offset + i] : 0.0f;
    *sample_rate = info.sample_rate;
    return 0;
  }
  if (ffdec::LooksLikeFfmpegFormat(
          reinterpret_cast<const uint8_t*>(magic), 8, path)) {
    std::fclose(f);
    ffdec::Info finfo;
    std::vector<float> mono;
    if (!ffdec::DecodeMonoFile(path, &finfo, &mono)) return -2;
    uint64_t n = mono.size();
    for (uint64_t i = 0; i < frames; ++i)
      out[i] = (offset < n && i < n - offset) ? mono[offset + i] : 0.0f;
    *sample_rate = finfo.sample_rate;
    return 0;
  }
  WavInfo info;
  bool ok = read_wav_header(f, &info);
  if (ok) ok = decode_frames(f, info, offset, frames, out);
  std::fclose(f);
  if (!ok) return -2;
  *sample_rate = info.sample_rate;
  return 0;
} catch (...) {
  return -3;  // never let bad_alloc cross the C ABI into ctypes
}

// Write a mono 16-bit PCM WAV (for generate_audio output parity).
int audioio_write_wav16(const char* path, const float* data, uint64_t frames,
                        uint32_t sample_rate) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_bytes = static_cast<uint32_t>(frames * 2);
  uint32_t riff_size = 36 + data_bytes;
  uint16_t fmt = 1, ch = 1, bits = 16;
  uint32_t byte_rate = sample_rate * 2, fmt_size = 16;
  uint16_t block_align = 2;
  // every fwrite checked: a full disk/quota error must return a failure,
  // never a silently truncated file with rc 0
  bool ok = std::fwrite("RIFF", 1, 4, f) == 4 &&
            std::fwrite(&riff_size, 4, 1, f) == 1 &&
            std::fwrite("WAVEfmt ", 1, 8, f) == 8 &&
            std::fwrite(&fmt_size, 4, 1, f) == 1 &&
            std::fwrite(&fmt, 2, 1, f) == 1 &&
            std::fwrite(&ch, 2, 1, f) == 1 &&
            std::fwrite(&sample_rate, 4, 1, f) == 1 &&
            std::fwrite(&byte_rate, 4, 1, f) == 1 &&
            std::fwrite(&block_align, 2, 1, f) == 1 &&
            std::fwrite(&bits, 2, 1, f) == 1 &&
            std::fwrite("data", 1, 4, f) == 4 &&
            std::fwrite(&data_bytes, 4, 1, f) == 1;
  std::vector<int16_t> pcm(frames);
  for (uint64_t i = 0; i < frames; ++i) {
    // Scale by 32768 (matching the decode divisor) and round-to-nearest so a
    // write/read roundtrip stays within half an LSB; clamp to int16 range.
    float v = data[i] * 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    pcm[i] = static_cast<int16_t>(std::lrintf(v));
  }
  ok = std::fwrite(pcm.data(), 2, frames, f) == frames && ok;
  ok = std::fclose(f) == 0 && ok;  // fclose flushes — its error counts too
  return ok ? 0 : -2;
}

void* audioio_prefetcher_create(const char** paths, uint64_t n_paths,
                                uint64_t segment_frames, int n_threads,
                                int queue_cap, uint64_t seed) try {
  std::vector<std::string> files(paths, paths + n_paths);
  if (files.empty()) return nullptr;
  return new Prefetcher(std::move(files), segment_frames, n_threads, queue_cap,
                        seed);
} catch (...) {
  return nullptr;
}

int audioio_prefetcher_next(void* p, float* out, uint32_t* sample_rate) {
  return static_cast<Prefetcher*>(p)->Next(out, sample_rate) ? 0 : -1;
}

void audioio_prefetcher_destroy(void* p) { delete static_cast<Prefetcher*>(p); }

}  // extern "C"
