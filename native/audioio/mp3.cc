// mp3dec implementation — see mp3.h.  All libmpg123 entry points are
// resolved with dlsym at first use; no link-time dependency.

#include "mp3.h"

#include <dlfcn.h>

#include <cstring>
#include <mutex>

namespace mp3dec {
namespace {

// mpg123.h ABI constants (stable since the 1.x series; the library's
// soname guarantees them for libmpg123.so.0).
constexpr int kMpg123Ok = 0;
constexpr int kMpg123Done = -12;
constexpr int kMpg123NewFormat = -11;
constexpr long kEncFloat32 = 0x200;          // MPG123_ENC_FLOAT_32
constexpr int kParamAddFlags = 2;            // MPG123_ADD_FLAGS
constexpr long kFlagQuiet = 0x20;            // MPG123_QUIET
constexpr long kFlagForceFloat = 0x400;      // MPG123_FORCE_FLOAT

struct Api {
  void* lib = nullptr;
  int (*init)() = nullptr;
  void* (*new_)(const char*, int*) = nullptr;
  void (*delete_)(void*) = nullptr;
  int (*param)(void*, int, long, double) = nullptr;
  int (*open)(void*, const char*) = nullptr;
  int (*close)(void*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*read)(void*, void*, size_t, size_t*) = nullptr;
  int (*scan)(void*) = nullptr;
  long (*length)(void*) = nullptr;  // off_t is 64-bit long on this ABI
  bool ok = false;
};

const Api& api() {
  static Api a;
  static std::once_flag once;
  std::call_once(once, [] {
    a.lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!a.lib) return;
    auto sym = [&](const char* name) { return dlsym(a.lib, name); };
    a.init = reinterpret_cast<int (*)()>(sym("mpg123_init"));
    a.new_ = reinterpret_cast<void* (*)(const char*, int*)>(sym("mpg123_new"));
    a.delete_ = reinterpret_cast<void (*)(void*)>(sym("mpg123_delete"));
    a.param =
        reinterpret_cast<int (*)(void*, int, long, double)>(sym("mpg123_param"));
    a.open = reinterpret_cast<int (*)(void*, const char*)>(sym("mpg123_open"));
    a.close = reinterpret_cast<int (*)(void*)>(sym("mpg123_close"));
    a.getformat = reinterpret_cast<int (*)(void*, long*, int*, int*)>(
        sym("mpg123_getformat"));
    a.read = reinterpret_cast<int (*)(void*, void*, size_t, size_t*)>(
        sym("mpg123_read"));
    a.scan = reinterpret_cast<int (*)(void*)>(sym("mpg123_scan"));
    a.length = reinterpret_cast<long (*)(void*)>(sym("mpg123_length"));
    a.ok = a.init && a.new_ && a.delete_ && a.param && a.open && a.close &&
           a.getformat && a.read && a.scan && a.length;
    // mpg123_init is a no-op since 1.27 but required for older sonames;
    // safe under the call_once.
    if (a.ok && a.init() != kMpg123Ok) a.ok = false;
  });
  return a;
}

// RAII handle: open path, force float32 output at the stream's native rate
// and channel count (no downmix — channel selection happens at the copy).
class Handle {
 public:
  explicit Handle(const char* path) {
    const Api& m = api();
    if (!m.ok) return;
    int err = 0;
    h_ = m.new_(nullptr, &err);
    if (!h_) return;
    // FORCE_FLOAT must be set BEFORE open: the stream's output format is
    // negotiated when the first header is parsed, and mpg123_format() calls
    // made after that only affect future tracks (verified empirically —
    // post-open forcing left the output at ENC_SIGNED_16).
    if (m.param(h_, kParamAddFlags, kFlagQuiet | kFlagForceFloat, 0.0) !=
        kMpg123Ok)
      return;
    if (m.open(h_, path) != kMpg123Ok) return;
    opened_ = true;
    long rate = 0;
    int ch = 0, enc = 0;
    if (m.getformat(h_, &rate, &ch, &enc) != kMpg123Ok || rate <= 0 ||
        ch <= 0 || ch > 2 || enc != kEncFloat32)
      return;
    rate_ = static_cast<uint32_t>(rate);
    channels_ = static_cast<uint32_t>(ch);
    ok_ = true;
  }

  ~Handle() {
    const Api& m = api();
    if (opened_) m.close(h_);
    if (h_) m.delete_(h_);
  }

  Handle(const Handle&) = delete;
  Handle& operator=(const Handle&) = delete;

  bool ok() const { return ok_; }
  uint32_t rate() const { return rate_; }
  uint32_t channels() const { return channels_; }
  void* get() const { return h_; }

 private:
  void* h_ = nullptr;
  bool opened_ = false;
  bool ok_ = false;
  uint32_t rate_ = 0;
  uint32_t channels_ = 0;
};

}  // namespace

bool Available() { return api().ok; }

bool LooksLikeMp3(const uint8_t* p, size_t n) {
  if (n >= 3 && p[0] == 'I' && p[1] == 'D' && p[2] == '3') return true;
  // 11-bit frame sync + a valid layer field (00 is reserved) — keeps RIFF,
  // fLaC and text files out while accepting all MPEG audio layers.
  return n >= 2 && p[0] == 0xFF && (p[1] & 0xE0) == 0xE0 &&
         (p[1] & 0x06) != 0;
}

bool ProbeFile(const char* path, Info* info) {
  Handle h(path);
  if (!h.ok()) return false;
  const Api& m = api();
  if (m.scan(h.get()) != kMpg123Ok) return false;
  long frames = m.length(h.get());
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
  const uint32_t ch = h.channels();
  mono->clear();
  std::vector<float> buf(16384);
  // Carry a partial PCM frame across reads: mpg123 hands back whole output
  // frames in practice, but the API contract is bytes, so don't rely on it.
  float pending = 0.0f;
  bool have_pending = false;
  while (true) {
    size_t done = 0;
    int rc = m.read(h.get(), buf.data(), buf.size() * sizeof(float), &done);
    size_t got = done / sizeof(float);
    size_t i = 0;
    if (ch == 2) {
      if (have_pending && got > 0) {  // complete the split frame: emit the
        mono->push_back(pending);     // carried L, drop its R (buf[0])
        have_pending = false;
        i = 1;
      }
      for (; i + 1 < got; i += 2) mono->push_back(buf[i]);
      if (i < got) {
        pending = buf[i];
        have_pending = true;
      }
    } else {
      for (; i < got; ++i) mono->push_back(buf[i]);
    }
    if (rc == kMpg123Done) break;
    if (rc == kMpg123NewFormat) {
      // Rate/channel change mid-stream (malformed concatenations): the
      // forced format pins encoding, but a channel flip would corrupt the
      // stride — treat as undecodable like the FLAC path does.
      long rate = 0;
      int nch = 0, enc = 0;
      if (m.getformat(h.get(), &rate, &nch, &enc) != kMpg123Ok ||
          static_cast<uint32_t>(nch) != ch ||
          static_cast<uint32_t>(rate) != h.rate())
        return false;
      continue;
    }
    if (rc != kMpg123Ok) return false;
  }
  if (ch == 2 && have_pending) mono->push_back(pending);
  info->sample_rate = h.rate();
  info->channels = ch;
  info->num_frames = mono->size();
  return true;
}

}  // namespace mp3dec
