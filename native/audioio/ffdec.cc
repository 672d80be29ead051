// ffdec implementation — see ffdec.h.  Types/constants come from the
// installed ffmpeg 5.x dev headers (which match the .so.59/.57 sonames
// dlopen'd below); functions are dlsym'd so nothing links at build time.

#include "ffdec.h"

#include <dlfcn.h>

#include <cctype>
#include <cstring>
#include <mutex>
#include <string>

namespace ffdec {
namespace {

bool has_suffix(const char* path, const char* ext) {
  std::string p(path);
  if (p.size() < std::strlen(ext)) return false;
  std::string tail = p.substr(p.size() - std::strlen(ext));
  for (auto& c : tail) c = static_cast<char>(std::tolower(c));
  return tail == ext;
}

}  // namespace

// Pure byte/suffix sniff — no ffmpeg dependency, compiled unconditionally
// so format *detection* (and the named-lib rejection message it feeds,
// mdctgan_tpu/data/native.py) works even on hosts built without headers.
bool LooksLikeFfmpegFormat(const uint8_t* p, size_t n, const char* path) {
  if (n >= 8 && std::memcmp(p + 4, "ftyp", 4) == 0) return true;  // MP4/M4A
  if (n >= 4 && p[0] == 0x30 && p[1] == 0x26 && p[2] == 0xB2 && p[3] == 0x75)
    return true;  // ASF (wma)
  // raw ADTS AAC: 12-bit sync + layer 00 (MPEG-audio mp3 has layer != 0,
  // so the two sniffs are disjoint)
  if (n >= 2 && p[0] == 0xFF && (p[1] & 0xF6) == 0xF0) return true;
  return has_suffix(path, ".m4a") || has_suffix(path, ".mp4") ||
         has_suffix(path, ".aac") || has_suffix(path, ".wma");
}

}  // namespace ffdec

// All ffmpeg FUNCTIONS are dlsym'd, so the only build-time dependency is
// the TYPES from the dev headers.  On a host without them, compile a stub
// whose Available() is false instead of failing the whole libaudioio build
// (which would silently degrade the native layer to WAV-only, dropping
// FLAC — the canonical VCTK format).
// (-DMDCTGAN_FFDEC_FORCE_STUB makes the headerless branch compile-testable
// on hosts that DO have the headers.)
#if !defined(MDCTGAN_FFDEC_FORCE_STUB) && defined(__has_include)
#if __has_include(<libavcodec/avcodec.h>) && \
    __has_include(<libavformat/avformat.h>) && \
    __has_include(<libavutil/avutil.h>)
#define MDCTGAN_FFDEC_HAVE_HEADERS 1
#endif
#endif

#ifdef MDCTGAN_FFDEC_HAVE_HEADERS

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/frame.h>
#include <libavutil/log.h>
}

namespace ffdec {
namespace {

struct Api {
  void* fmt = nullptr;
  void* cod = nullptr;
  void* util = nullptr;
  // libavformat
  int (*open_input)(AVFormatContext**, const char*, const AVInputFormat*,
                    AVDictionary**) = nullptr;
  void (*close_input)(AVFormatContext**) = nullptr;
  int (*find_stream_info)(AVFormatContext*, AVDictionary**) = nullptr;
  int (*find_best_stream)(AVFormatContext*, enum AVMediaType, int, int,
                          const AVCodec**, int) = nullptr;
  int (*read_frame)(AVFormatContext*, AVPacket*) = nullptr;
  // libavcodec
  AVCodecContext* (*alloc_context)(const AVCodec*) = nullptr;
  void (*free_context)(AVCodecContext**) = nullptr;
  int (*params_to_context)(AVCodecContext*, const AVCodecParameters*) = nullptr;
  int (*open2)(AVCodecContext*, const AVCodec*, AVDictionary**) = nullptr;
  int (*send_packet)(AVCodecContext*, const AVPacket*) = nullptr;
  int (*receive_frame)(AVCodecContext*, AVFrame*) = nullptr;
  AVPacket* (*packet_alloc)() = nullptr;
  void (*packet_free)(AVPacket**) = nullptr;
  void (*packet_unref)(AVPacket*) = nullptr;
  // libavutil
  AVFrame* (*frame_alloc)() = nullptr;
  void (*frame_free)(AVFrame**) = nullptr;
  void (*frame_unref)(AVFrame*) = nullptr;
  void (*log_set_level)(int) = nullptr;
  bool ok = false;
};

const Api& api() {
  static Api a;
  static std::once_flag once;
  std::call_once(once, [] {
    // Sonames pin the ABI the headers above describe; a host with a
    // different ffmpeg major fails the dlopen and the feature stays off.
    a.util = dlopen("libavutil.so.57", RTLD_NOW | RTLD_GLOBAL);
    a.cod = dlopen("libavcodec.so.59", RTLD_NOW | RTLD_GLOBAL);
    a.fmt = dlopen("libavformat.so.59", RTLD_NOW | RTLD_GLOBAL);
    if (!a.util || !a.cod || !a.fmt) return;
    auto F = [&](const char* n) { return dlsym(a.fmt, n); };
    auto C = [&](const char* n) { return dlsym(a.cod, n); };
    auto U = [&](const char* n) { return dlsym(a.util, n); };
    a.open_input = reinterpret_cast<decltype(a.open_input)>(
        F("avformat_open_input"));
    a.close_input = reinterpret_cast<decltype(a.close_input)>(
        F("avformat_close_input"));
    a.find_stream_info = reinterpret_cast<decltype(a.find_stream_info)>(
        F("avformat_find_stream_info"));
    a.find_best_stream = reinterpret_cast<decltype(a.find_best_stream)>(
        F("av_find_best_stream"));
    a.read_frame =
        reinterpret_cast<decltype(a.read_frame)>(F("av_read_frame"));
    a.alloc_context = reinterpret_cast<decltype(a.alloc_context)>(
        C("avcodec_alloc_context3"));
    a.free_context = reinterpret_cast<decltype(a.free_context)>(
        C("avcodec_free_context"));
    a.params_to_context = reinterpret_cast<decltype(a.params_to_context)>(
        C("avcodec_parameters_to_context"));
    a.open2 = reinterpret_cast<decltype(a.open2)>(C("avcodec_open2"));
    a.send_packet =
        reinterpret_cast<decltype(a.send_packet)>(C("avcodec_send_packet"));
    a.receive_frame = reinterpret_cast<decltype(a.receive_frame)>(
        C("avcodec_receive_frame"));
    a.packet_alloc =
        reinterpret_cast<decltype(a.packet_alloc)>(C("av_packet_alloc"));
    a.packet_free =
        reinterpret_cast<decltype(a.packet_free)>(C("av_packet_free"));
    a.packet_unref =
        reinterpret_cast<decltype(a.packet_unref)>(C("av_packet_unref"));
    a.frame_alloc =
        reinterpret_cast<decltype(a.frame_alloc)>(U("av_frame_alloc"));
    a.frame_free =
        reinterpret_cast<decltype(a.frame_free)>(U("av_frame_free"));
    a.frame_unref =
        reinterpret_cast<decltype(a.frame_unref)>(U("av_frame_unref"));
    a.log_set_level =
        reinterpret_cast<decltype(a.log_set_level)>(U("av_log_set_level"));
    a.ok = a.open_input && a.close_input && a.find_stream_info &&
           a.find_best_stream && a.read_frame && a.alloc_context &&
           a.free_context && a.params_to_context && a.open2 &&
           a.send_packet && a.receive_frame && a.packet_alloc &&
           a.packet_free && a.packet_unref && a.frame_alloc && a.frame_free &&
           a.frame_unref && a.log_set_level;
    if (a.ok) a.log_set_level(AV_LOG_QUIET);
  });
  return a;
}

// Append channel 0 of one decoded frame (any common sample format).
bool append_channel0(const AVFrame* fr, std::vector<float>* mono) {
  const int n = fr->nb_samples;
  const int ch = fr->ch_layout.nb_channels;
  if (n <= 0 || ch <= 0) return false;
  switch (fr->format) {
    case AV_SAMPLE_FMT_FLTP: {
      const float* p = reinterpret_cast<const float*>(fr->data[0]);
      mono->insert(mono->end(), p, p + n);
      return true;
    }
    case AV_SAMPLE_FMT_FLT: {
      const float* p = reinterpret_cast<const float*>(fr->data[0]);
      for (int i = 0; i < n; ++i) mono->push_back(p[i * ch]);
      return true;
    }
    case AV_SAMPLE_FMT_S16P: {
      const int16_t* p = reinterpret_cast<const int16_t*>(fr->data[0]);
      for (int i = 0; i < n; ++i) mono->push_back(p[i] / 32768.0f);
      return true;
    }
    case AV_SAMPLE_FMT_S16: {
      const int16_t* p = reinterpret_cast<const int16_t*>(fr->data[0]);
      for (int i = 0; i < n; ++i) mono->push_back(p[i * ch] / 32768.0f);
      return true;
    }
    case AV_SAMPLE_FMT_S32P: {
      const int32_t* p = reinterpret_cast<const int32_t*>(fr->data[0]);
      for (int i = 0; i < n; ++i)
        mono->push_back(static_cast<float>(p[i]) / 2147483648.0f);
      return true;
    }
    case AV_SAMPLE_FMT_S32: {
      const int32_t* p = reinterpret_cast<const int32_t*>(fr->data[0]);
      for (int i = 0; i < n; ++i)
        mono->push_back(static_cast<float>(p[i * ch]) / 2147483648.0f);
      return true;
    }
    case AV_SAMPLE_FMT_DBLP: {
      const double* p = reinterpret_cast<const double*>(fr->data[0]);
      for (int i = 0; i < n; ++i) mono->push_back(static_cast<float>(p[i]));
      return true;
    }
    case AV_SAMPLE_FMT_DBL: {
      const double* p = reinterpret_cast<const double*>(fr->data[0]);
      for (int i = 0; i < n; ++i)
        mono->push_back(static_cast<float>(p[i * ch]));
      return true;
    }
    default:
      return false;  // u8 and exotic formats: treat as undecodable
  }
}

bool decode_impl(const char* path, Info* info, std::vector<float>* mono) {
  const Api& m = api();
  if (!m.ok) return false;
  AVFormatContext* ctx = nullptr;
  if (m.open_input(&ctx, path, nullptr, nullptr) < 0) return false;
  AVCodecContext* cctx = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* fr = nullptr;
  bool ok = false;
  do {
    if (m.find_stream_info(ctx, nullptr) < 0) break;
    const AVCodec* codec = nullptr;
    const int aidx =
        m.find_best_stream(ctx, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (aidx < 0 || !codec) break;
    cctx = m.alloc_context(codec);
    if (!cctx) break;
    if (m.params_to_context(cctx, ctx->streams[aidx]->codecpar) < 0) break;
    if (m.open2(cctx, codec, nullptr) < 0) break;
    pkt = m.packet_alloc();
    fr = m.frame_alloc();
    if (!pkt || !fr) break;
    mono->clear();
    uint32_t rate = 0, channels = 0;
    bool decode_err = false;
    auto drain = [&]() {
      while (m.receive_frame(cctx, fr) == 0) {
        if (!rate && fr->sample_rate > 0) {
          rate = static_cast<uint32_t>(fr->sample_rate);
          channels = static_cast<uint32_t>(fr->ch_layout.nb_channels);
        } else if (rate &&
                   (static_cast<uint32_t>(fr->sample_rate) != rate ||
                    static_cast<uint32_t>(fr->ch_layout.nb_channels) !=
                        channels)) {
          // mid-stream rate/channel flip: appending these samples under the
          // first frame's rate would yield silently wrong-speed audio —
          // treat as undecodable, like the mp3 NEW_FORMAT path.
          decode_err = true;
        }
        if (!append_channel0(fr, mono)) decode_err = true;
        m.frame_unref(fr);
      }
    };
    while (!decode_err && m.read_frame(ctx, pkt) >= 0) {
      if (pkt->stream_index == aidx) {
        if (m.send_packet(cctx, pkt) == 0) drain();
        // non-zero send: a damaged packet — skip it like sox does
      }
      m.packet_unref(pkt);
    }
    if (!decode_err) {
      m.send_packet(cctx, nullptr);  // flush the decoder
      drain();
    }
    if (decode_err || mono->empty() || rate == 0) break;
    info->sample_rate = rate;
    info->channels = channels;
    info->num_frames = mono->size();
    ok = true;
  } while (false);
  if (fr) m.frame_free(&fr);
  if (pkt) m.packet_free(&pkt);
  if (cctx) m.free_context(&cctx);
  m.close_input(&ctx);
  return ok;
}

}  // namespace

bool Available() { return api().ok; }

bool ProbeFile(const char* path, Info* info) {
  std::vector<float> mono;
  return decode_impl(path, info, &mono);
}

bool DecodeMonoFile(const char* path, Info* info, std::vector<float>* mono) {
  return decode_impl(path, info, mono);
}

}  // namespace ffdec

#else  // !MDCTGAN_FFDEC_HAVE_HEADERS

namespace ffdec {

bool Available() { return false; }

bool ProbeFile(const char*, Info*) { return false; }

bool DecodeMonoFile(const char*, Info*, std::vector<float>*) { return false; }

}  // namespace ffdec

#endif  // MDCTGAN_FFDEC_HAVE_HEADERS
