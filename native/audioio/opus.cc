// opusdec implementation — see opus.h.  libogg demuxes the container;
// libopus decodes the packets.  Both are resolved with dlsym at first use.

#include "opus.h"

#include <dlfcn.h>

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>

namespace opusdec {
namespace {

// Opaque libogg structs are oversized byte buffers — the library only ever
// sees pointers to memory we own (ogg_sync_state is ~32 B, ogg_stream_state
// ~408 B on this ABI).
constexpr size_t kSyncBytes = 512;
constexpr size_t kStreamBytes = 1024;

// ogg_packet / ogg_page have a stable public layout (ogg/ogg.h).
struct OggPacket {
  unsigned char* packet;
  long bytes;
  long b_o_s;
  long e_o_s;
  int64_t granulepos;
  int64_t packetno;
};

struct OggPage {
  unsigned char* header;
  long header_len;
  unsigned char* body;
  long body_len;
};

constexpr int kMaxFrameSamples = 5760;  // 120 ms at 48 kHz

struct Api {
  void* ogg = nullptr;
  void* opus = nullptr;
  // libogg
  int (*sync_init)(void*) = nullptr;
  int (*sync_clear)(void*) = nullptr;
  char* (*sync_buffer)(void*, long) = nullptr;
  int (*sync_wrote)(void*, long) = nullptr;
  int (*sync_pageout)(void*, OggPage*) = nullptr;
  int (*stream_init)(void*, int) = nullptr;
  int (*stream_clear)(void*) = nullptr;
  int (*stream_pagein)(void*, OggPage*) = nullptr;
  int (*stream_packetout)(void*, OggPacket*) = nullptr;
  int (*page_serialno)(const OggPage*) = nullptr;
  int (*page_bos)(const OggPage*) = nullptr;
  int64_t (*page_granulepos)(const OggPage*) = nullptr;
  // libopus
  void* (*decoder_create)(int32_t, int, int*) = nullptr;
  void (*decoder_destroy)(void*) = nullptr;
  int (*decode_float)(void*, const unsigned char*, int32_t, float*, int,
                      int) = nullptr;
  bool ok = false;
};

const Api& api() {
  static Api a;
  static std::once_flag once;
  std::call_once(once, [] {
    a.ogg = dlopen("libogg.so.0", RTLD_NOW | RTLD_LOCAL);
    a.opus = dlopen("libopus.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!a.ogg || !a.opus) return;
    auto og = [&](const char* n) { return dlsym(a.ogg, n); };
    auto op = [&](const char* n) { return dlsym(a.opus, n); };
    a.sync_init = reinterpret_cast<int (*)(void*)>(og("ogg_sync_init"));
    a.sync_clear = reinterpret_cast<int (*)(void*)>(og("ogg_sync_clear"));
    a.sync_buffer =
        reinterpret_cast<char* (*)(void*, long)>(og("ogg_sync_buffer"));
    a.sync_wrote =
        reinterpret_cast<int (*)(void*, long)>(og("ogg_sync_wrote"));
    a.sync_pageout =
        reinterpret_cast<int (*)(void*, OggPage*)>(og("ogg_sync_pageout"));
    a.stream_init =
        reinterpret_cast<int (*)(void*, int)>(og("ogg_stream_init"));
    a.stream_clear = reinterpret_cast<int (*)(void*)>(og("ogg_stream_clear"));
    a.stream_pagein =
        reinterpret_cast<int (*)(void*, OggPage*)>(og("ogg_stream_pagein"));
    a.stream_packetout = reinterpret_cast<int (*)(void*, OggPacket*)>(
        og("ogg_stream_packetout"));
    a.page_serialno =
        reinterpret_cast<int (*)(const OggPage*)>(og("ogg_page_serialno"));
    a.page_bos =
        reinterpret_cast<int (*)(const OggPage*)>(og("ogg_page_bos"));
    a.page_granulepos = reinterpret_cast<int64_t (*)(const OggPage*)>(
        og("ogg_page_granulepos"));
    a.decoder_create = reinterpret_cast<void* (*)(int32_t, int, int*)>(
        op("opus_decoder_create"));
    a.decoder_destroy =
        reinterpret_cast<void (*)(void*)>(op("opus_decoder_destroy"));
    a.decode_float =
        reinterpret_cast<int (*)(void*, const unsigned char*, int32_t, float*,
                                 int, int)>(op("opus_decode_float"));
    a.ok = a.sync_init && a.sync_clear && a.sync_buffer && a.sync_wrote &&
           a.sync_pageout && a.stream_init && a.stream_clear &&
           a.stream_pagein && a.stream_packetout && a.page_serialno &&
           a.page_bos && a.page_granulepos && a.decoder_create &&
           a.decoder_destroy && a.decode_float;
  });
  return a;
}

uint16_t le16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

struct OpusHead {
  uint32_t channels = 0;
  uint16_t pre_skip = 0;
  double gain = 1.0;  // output gain, Q7.8 dB -> linear
};

bool parse_opus_head(const unsigned char* p, long n, OpusHead* head) {
  // RFC 7845 §5.1: "OpusHead" ver(1) ch(1) pre_skip(2 LE) rate(4 LE)
  // gain(2 LE, Q7.8 dB) mapping_family(1).
  if (n < 19 || std::memcmp(p, "OpusHead", 8) != 0) return false;
  if ((p[8] & 0xF0) != 0) return false;  // version major must be 0
  head->channels = p[9];
  head->pre_skip = le16(p + 10);
  const int16_t gain_q78 = static_cast<int16_t>(le16(p + 16));
  head->gain = std::pow(10.0, gain_q78 / (20.0 * 256.0));
  // mapping family 0 = mono/stereo single stream; family 1+ needs the
  // multistream decoder — treat as undecodable rather than mis-decode.
  if (p[18] != 0 || head->channels == 0 || head->channels > 2) return false;
  return true;
}

// Shared Ogg walk: feeds pages of the FIRST bos stream whose first packet
// is OpusHead to `on_packet(packet_index, packet)`; tracks the last
// granulepos seen on that stream.  Returns false on container-level failure
// or if no opus stream is found.
template <typename F>
bool walk(const char* path, OpusHead* head, int64_t* last_granule,
          F&& on_packet) {
  const Api& m = api();
  if (!m.ok) return false;
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::vector<uint8_t> oy(kSyncBytes, 0), os(kStreamBytes, 0);
  m.sync_init(oy.data());
  bool stream_open = false, found = false, failed = false;
  int serial = 0;
  int64_t packet_index = 0;
  *last_granule = -1;
  OggPage pg;
  OggPacket pk;
  while (!failed) {
    int r = m.sync_pageout(oy.data(), &pg);
    if (r == 0) {  // need more bytes
      char* buf = m.sync_buffer(oy.data(), 65536);
      if (!buf) break;
      size_t got = std::fread(buf, 1, 65536, f);
      if (got == 0) break;  // EOF
      m.sync_wrote(oy.data(), static_cast<long>(got));
      continue;
    }
    if (r < 0) continue;  // hole/desync: skip, like the vorbis path
    if (!found) {
      if (!m.page_bos(&pg)) continue;  // some other stream's later page
      serial = m.page_serialno(&pg);
      m.stream_init(os.data(), serial);
      stream_open = true;
      m.stream_pagein(os.data(), &pg);
      if (m.stream_packetout(os.data(), &pk) == 1 &&
          parse_opus_head(pk.packet, pk.bytes, head)) {
        found = true;
        packet_index = 1;
      } else {
        m.stream_clear(os.data());
        stream_open = false;  // not opus: try the next bos page
      }
      continue;
    }
    if (m.page_serialno(&pg) != serial) continue;
    m.stream_pagein(os.data(), &pg);
    const int64_t g = m.page_granulepos(&pg);
    if (g >= 0) *last_granule = g;
    while (m.stream_packetout(os.data(), &pk) == 1) {
      if (!on_packet(packet_index++, pk)) {
        failed = true;
        break;
      }
    }
  }
  if (stream_open) m.stream_clear(os.data());
  m.sync_clear(oy.data());
  std::fclose(f);
  return found && !failed;
}

}  // namespace

bool Available() { return api().ok; }

bool ProbeFile(const char* path, Info* info) {
  OpusHead head;
  int64_t last_granule = -1;
  // packets are not decoded for a probe — only demuxed and counted
  if (!walk(path, &head, &last_granule,
            [](int64_t, const OggPacket&) { return true; }))
    return false;
  if (last_granule < head.pre_skip) return false;
  info->sample_rate = 48000;
  info->channels = head.channels;
  info->num_frames = static_cast<uint64_t>(last_granule - head.pre_skip);
  return true;
}

bool DecodeMonoFile(const char* path, Info* info, std::vector<float>* mono) {
  const Api& m = api();
  OpusHead head;
  int64_t last_granule = -1;
  void* dec = nullptr;
  std::vector<float> buf;
  mono->clear();
  auto on_packet = [&](int64_t idx, const OggPacket& pk) {
    if (idx == 1) return true;  // OpusTags (RFC 7845 §5.2): skip
    if (!dec) {
      int err = 0;
      dec = m.decoder_create(48000, static_cast<int>(head.channels), &err);
      if (!dec || err != 0) return false;
      buf.resize(static_cast<size_t>(kMaxFrameSamples) * head.channels);
    }
    int got = m.decode_float(dec, pk.packet, static_cast<int32_t>(pk.bytes),
                             buf.data(), kMaxFrameSamples, 0);
    if (got < 0) return false;
    const float g = static_cast<float>(head.gain);
    if (head.channels == 2) {
      for (int i = 0; i < got; ++i) mono->push_back(buf[2 * i] * g);
    } else {
      for (int i = 0; i < got; ++i) mono->push_back(buf[i] * g);
    }
    return true;
  };
  const bool ok = walk(path, &head, &last_granule, on_packet);
  if (dec) m.decoder_destroy(dec);
  if (!ok || !dec) return false;
  // RFC 7845 §4.2: drop pre_skip samples from the front; the final page's
  // granulepos bounds the real length (the last packet may carry padding).
  if (mono->size() <= head.pre_skip) return false;
  mono->erase(mono->begin(), mono->begin() + head.pre_skip);
  if (last_granule >= head.pre_skip) {
    const uint64_t real = static_cast<uint64_t>(last_granule - head.pre_skip);
    if (real < mono->size()) mono->resize(real);
  }
  info->sample_rate = 48000;
  info->channels = head.channels;
  info->num_frames = mono->size();
  return true;
}

}  // namespace opusdec
