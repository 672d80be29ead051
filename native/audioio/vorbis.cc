// vorbisdec implementation — see vorbis.h.  All libvorbisfile entry points
// are resolved with dlsym at first use; no link-time dependency.

#include "vorbis.h"

#include <dlfcn.h>

#include <cstring>
#include <mutex>

namespace vorbisdec {
namespace {

// The OggVorbis_File struct is ~940 bytes on this ABI; allocate with ample
// headroom since we only ever hand the library a pointer to memory we own.
constexpr size_t kOvFileBytes = 4096;

// vorbis_info leading fields (vorbis/codec.h, stable ABI):
//   int version; int channels; long rate; ...
struct VorbisInfoHead {
  int version;
  int channels;
  long rate;
};

struct Api {
  void* lib = nullptr;
  int (*fopen)(const char*, void*) = nullptr;
  const VorbisInfoHead* (*info)(void*, int) = nullptr;
  int64_t (*pcm_total)(void*, int) = nullptr;
  long (*read_float)(void*, float***, int, int*) = nullptr;
  int (*clear)(void*) = nullptr;
  bool ok = false;
};

const Api& api() {
  static Api a;
  static std::once_flag once;
  std::call_once(once, [] {
    // libvorbisfile's own NEEDED entries pull in libvorbis + libogg, so
    // RTLD_NOW resolves the whole chain or fails cleanly.
    a.lib = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_LOCAL);
    if (!a.lib) return;
    auto sym = [&](const char* name) { return dlsym(a.lib, name); };
    a.fopen = reinterpret_cast<int (*)(const char*, void*)>(sym("ov_fopen"));
    a.info = reinterpret_cast<const VorbisInfoHead* (*)(void*, int)>(
        sym("ov_info"));
    a.pcm_total = reinterpret_cast<int64_t (*)(void*, int)>(
        sym("ov_pcm_total"));
    a.read_float = reinterpret_cast<long (*)(void*, float***, int, int*)>(
        sym("ov_read_float"));
    a.clear = reinterpret_cast<int (*)(void*)>(sym("ov_clear"));
    a.ok = a.fopen && a.info && a.pcm_total && a.read_float && a.clear;
  });
  return a;
}

// RAII file handle.
class Handle {
 public:
  explicit Handle(const char* path) {
    const Api& m = api();
    if (!m.ok) return;
    buf_.assign(kOvFileBytes, 0);
    if (m.fopen(path, buf_.data()) != 0) return;  // not vorbis / unreadable
    opened_ = true;
    const VorbisInfoHead* vi = m.info(buf_.data(), -1);
    if (!vi || vi->channels <= 0 || vi->channels > 255 || vi->rate <= 0)
      return;
    rate_ = static_cast<uint32_t>(vi->rate);
    channels_ = static_cast<uint32_t>(vi->channels);
    ok_ = true;
  }

  ~Handle() {
    if (opened_) api().clear(buf_.data());
  }

  Handle(const Handle&) = delete;
  Handle& operator=(const Handle&) = delete;

  bool ok() const { return ok_; }
  uint32_t rate() const { return rate_; }
  uint32_t channels() const { return channels_; }
  void* get() { return buf_.data(); }

 private:
  std::vector<uint8_t> buf_;
  bool opened_ = false;
  bool ok_ = false;
  uint32_t rate_ = 0;
  uint32_t channels_ = 0;
};

}  // namespace

bool Available() { return api().ok; }

bool LooksLikeOgg(const uint8_t* p, size_t n) {
  return n >= 4 && std::memcmp(p, "OggS", 4) == 0;
}

bool ProbeFile(const char* path, Info* info) {
  Handle h(path);
  if (!h.ok()) return false;
  int64_t frames = api().pcm_total(h.get(), -1);
  if (frames <= 0) return false;
  info->sample_rate = h.rate();
  info->channels = h.channels();
  info->num_frames = static_cast<uint64_t>(frames);
  return true;
}

bool DecodeMonoFile(const char* path, Info* info, std::vector<float>* mono) {
  Handle h(path);
  if (!h.ok()) return false;
  const Api& m = api();
  mono->clear();
  int bitstream = 0;
  int first_link = -1;
  while (true) {
    float** pcm = nullptr;  // per-channel (NOT interleaved) buffers
    long got = m.read_float(h.get(), &pcm, 4096, &bitstream);
    if (got == 0) break;  // EOF
    if (got < 0) {
      // OV_HOLE (-3): recoverable sync loss (e.g. a damaged page) — the
      // stream continues after it, matching sox's tolerant decode.  Other
      // negatives are real errors.
      if (got == -3) continue;
      return false;
    }
    if (first_link < 0) {
      first_link = bitstream;
    } else if (bitstream != first_link) {
      // chained Ogg: a later link may carry a different rate/channel
      // count — appending its samples under the first link's rate would
      // be silently wrong-speed audio.  Accept the new link only if its
      // format matches; otherwise undecodable (like the mp3 NEW_FORMAT
      // path).
      const VorbisInfoHead* vi = m.info(h.get(), bitstream);
      if (!vi || static_cast<uint32_t>(vi->rate) != h.rate() ||
          static_cast<uint32_t>(vi->channels) != h.channels())
        return false;
      first_link = bitstream;
    }
    if (!pcm || !pcm[0]) return false;
    mono->insert(mono->end(), pcm[0], pcm[0] + got);  // channel 0
  }
  info->sample_rate = h.rate();
  info->channels = h.channels();
  info->num_frames = mono->size();
  return true;
}

}  // namespace vorbisdec
