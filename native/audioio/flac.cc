// FLAC decoder implementation.  Format reference: RFC 9639 (the FLAC
// specification); this is an independent implementation sized to the audioio
// host path (whole-file in-memory decode of short speech corpus files).

#include "flac.h"

#include <cstring>

namespace flacdec {
namespace {

// MSB-first bit reader over an in-memory buffer.
class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size) : data_(data), size_(size) {}

  bool ReadBits(int n, uint64_t* out) {
    uint64_t v = 0;
    while (n > 0) {
      if (byte_ >= size_) return false;
      int avail = 8 - bit_;
      int take = n < avail ? n : avail;
      int shift = avail - take;
      v = (v << take) | ((data_[byte_] >> shift) & ((1u << take) - 1));
      bit_ += take;
      if (bit_ == 8) {
        bit_ = 0;
        ++byte_;
      }
      n -= take;
    }
    *out = v;
    return true;
  }

  bool ReadSigned(int n, int64_t* out) {
    if (n == 0) {
      *out = 0;
      return true;
    }
    uint64_t v;
    if (!ReadBits(n, &v)) return false;
    // sign-extend
    if (v & (1ull << (n - 1))) v |= ~((1ull << n) - 1);
    *out = static_cast<int64_t>(v);
    return true;
  }

  // Count 0 bits up to the terminating 1.
  bool ReadUnary(uint32_t* out) {
    uint32_t q = 0;
    while (true) {
      if (byte_ >= size_) return false;
      uint8_t rest = data_[byte_] & ((1u << (8 - bit_)) - 1);
      if (rest == 0) {
        q += 8 - bit_;
        bit_ = 0;
        ++byte_;
        continue;
      }
      // position of highest set bit in the remaining bits
      int hi = 7;
      while (!(rest & (1u << hi))) --hi;
      int zeros = (8 - bit_) - 1 - hi;
      q += zeros;
      bit_ += zeros + 1;
      if (bit_ == 8) {
        bit_ = 0;
        ++byte_;
      }
      *out = q;
      return true;
    }
  }

  void AlignByte() {
    if (bit_) {
      bit_ = 0;
      ++byte_;
    }
  }

  bool AtEnd() const { return byte_ >= size_; }
  void SeekBytes(size_t byte) {
    byte_ = byte;
    bit_ = 0;
  }
  size_t BytePos() const { return byte_; }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t byte_ = 0;
  int bit_ = 0;
};

// Coded-number field in the frame header (UTF-8-like, up to 36 bits).
bool ReadCodedNumber(BitReader* br, uint64_t* out) {
  uint64_t b0;
  if (!br->ReadBits(8, &b0)) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    *out = b0;
    return true;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint64_t b;
    if (!br->ReadBits(8, &b)) return false;
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

bool DecodeResidual(BitReader* br, uint32_t block_size, uint32_t order,
                    int64_t* out /* block_size entries, [order..) filled */) {
  uint64_t method, po;
  if (!br->ReadBits(2, &method) || method > 1) return false;
  if (!br->ReadBits(4, &po)) return false;
  int param_bits = method ? 5 : 4;
  uint64_t escape = method ? 31 : 15;
  uint32_t partitions = 1u << po;
  // The first partition holds (block_size >> po) - order samples; reject
  // orders larger than the partition size or the count underflows and the
  // residual loop would write past `out` (block_size entries).
  if ((block_size >> po) == 0 || (block_size % partitions) != 0 ||
      order > (block_size >> po))
    return false;
  uint32_t idx = order;
  for (uint32_t p = 0; p < partitions; ++p) {
    uint32_t count = (block_size >> po) - (p == 0 ? order : 0);
    uint64_t param;
    if (!br->ReadBits(param_bits, &param)) return false;
    if (param == escape) {
      uint64_t raw_bits;
      if (!br->ReadBits(5, &raw_bits)) return false;
      for (uint32_t i = 0; i < count; ++i) {
        int64_t v;
        if (!br->ReadSigned(static_cast<int>(raw_bits), &v)) return false;
        out[idx++] = v;
      }
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q;
        if (!br->ReadUnary(&q)) return false;
        uint64_t r = 0;
        if (param && !br->ReadBits(static_cast<int>(param), &r)) return false;
        uint64_t u = (static_cast<uint64_t>(q) << param) | r;
        out[idx++] = static_cast<int64_t>(u >> 1) ^ -static_cast<int64_t>(u & 1);
      }
    }
  }
  return idx == block_size;
}

bool DecodeSubframe(BitReader* br, uint32_t block_size, int bps,
                    std::vector<int64_t>* out) {
  uint64_t pad, type, wflag;
  if (!br->ReadBits(1, &pad) || pad != 0) return false;
  if (!br->ReadBits(6, &type)) return false;
  if (!br->ReadBits(1, &wflag)) return false;
  int wasted = 0;
  if (wflag) {
    uint32_t k;
    if (!br->ReadUnary(&k)) return false;
    wasted = static_cast<int>(k) + 1;
  }
  int ebps = bps - wasted;
  if (ebps <= 0 || ebps > 33) return false;
  out->assign(block_size, 0);
  int64_t* x = out->data();

  if (type == 0) {  // CONSTANT
    int64_t v;
    if (!br->ReadSigned(ebps, &v)) return false;
    for (uint32_t i = 0; i < block_size; ++i) x[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < block_size; ++i)
      if (!br->ReadSigned(ebps, &x[i])) return false;
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    uint32_t order = type & 0x07;
    if (order > block_size) return false;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->ReadSigned(ebps, &x[i])) return false;
    if (!DecodeResidual(br, block_size, order, x)) return false;
    switch (order) {
      case 0:
        break;
      case 1:
        for (uint32_t i = 1; i < block_size; ++i) x[i] += x[i - 1];
        break;
      case 2:
        for (uint32_t i = 2; i < block_size; ++i)
          x[i] += 2 * x[i - 1] - x[i - 2];
        break;
      case 3:
        for (uint32_t i = 3; i < block_size; ++i)
          x[i] += 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3];
        break;
      case 4:
        for (uint32_t i = 4; i < block_size; ++i)
          x[i] += 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4];
        break;
    }
  } else if (type & 0x20) {  // LPC
    uint32_t order = (type & 0x1F) + 1;
    if (order > block_size) return false;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->ReadSigned(ebps, &x[i])) return false;
    uint64_t prec_m1, shift_u;
    if (!br->ReadBits(4, &prec_m1) || prec_m1 == 15) return false;
    int precision = static_cast<int>(prec_m1) + 1;
    if (!br->ReadBits(5, &shift_u)) return false;
    int shift = static_cast<int>(shift_u);
    if (shift & 0x10) return false;  // negative shifts are forbidden
    int64_t coef[32];
    for (uint32_t i = 0; i < order; ++i)
      if (!br->ReadSigned(precision, &coef[i])) return false;
    if (!DecodeResidual(br, block_size, order, x)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      // accumulate in uint64 (defined wraparound) — crafted coefficients can
      // make the feedback grow geometrically and a signed overflow is UB;
      // corrupt input then yields garbage samples, never undefined behavior
      uint64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j)
        acc += static_cast<uint64_t>(coef[j]) *
               static_cast<uint64_t>(x[i - 1 - j]);
      x[i] = static_cast<int64_t>(
          static_cast<uint64_t>(x[i]) +
          static_cast<uint64_t>(static_cast<int64_t>(acc) >> shift));
    }
  } else {
    return false;  // reserved type
  }
  if (wasted)
    for (uint32_t i = 0; i < block_size; ++i)
      x[i] = static_cast<int64_t>(static_cast<uint64_t>(x[i]) << wasted);
  return true;
}

}  // namespace

bool IsFlac(const uint8_t* data, size_t size) {
  return size >= 4 && std::memcmp(data, "fLaC", 4) == 0;
}

bool Probe(const uint8_t* data, size_t size, Info* info) {
  if (!IsFlac(data, size)) return false;
  size_t pos = 4;
  bool last = false;
  bool have_streaminfo = false;
  while (!last) {
    if (pos + 4 > size) return false;
    last = data[pos] & 0x80;
    int type = data[pos] & 0x7F;
    uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > size) return false;
    if (type == 0) {  // STREAMINFO
      if (len < 34) return false;
      const uint8_t* p = data + pos;
      // [0:2) min blocksize, [2:4) max blocksize, [4:7) min framesize,
      // [7:10) max framesize, then 20 bits rate | 3 bits ch-1 | 5 bits bps-1
      // | 36 bits total samples.
      info->sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      info->channels = ((p[12] >> 1) & 0x7) + 1;
      info->bits_per_sample = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      info->num_frames = (static_cast<uint64_t>(p[13] & 0x0F) << 32) |
                         (static_cast<uint64_t>(p[14]) << 24) |
                         (p[15] << 16) | (p[16] << 8) | p[17];
      have_streaminfo = true;
    }
    pos += len;
  }
  return have_streaminfo && info->sample_rate > 0;
}

bool DecodeMono(const uint8_t* data, size_t size, Info* info,
                std::vector<float>* out) {
  if (!Probe(data, size, info)) return false;
  // Skip metadata blocks to the first frame.
  size_t pos = 4;
  bool last = false;
  while (!last) {
    last = data[pos] & 0x80;
    uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4 + len;
  }
  BitReader br(data, size);
  br.SeekBytes(pos);

  const float scale =
      1.0f / static_cast<float>(1ull << (info->bits_per_sample - 1));
  std::vector<std::vector<int64_t>> ch;
  out->clear();
  // Allocation guards against corrupt/malicious input: a frame with a
  // CONSTANT subframe amplifies ~10 input bytes into up to 65536 samples,
  // and STREAMINFO's total-samples field is 36 bits wide.
  const uint64_t kMaxReserve = 1ull << 28;  // 1 GiB of float32
  const uint64_t limit = info->num_frames
                             ? info->num_frames + 65536
                             : static_cast<uint64_t>(size) * 64 + (1u << 20);
  if (limit > kMaxReserve) return false;
  if (info->num_frames) out->reserve(info->num_frames);

  while (!br.AtEnd()) {
    // Frame header: 14-bit sync (frames are byte-aligned).
    uint64_t sync;
    if (!br.ReadBits(14, &sync)) break;
    if (sync != 0x3FFE) return false;
    uint64_t reserved, strategy;
    if (!br.ReadBits(1, &reserved) || !br.ReadBits(1, &strategy)) return false;
    uint64_t bs_code, sr_code, ch_asgn, ss_code, reserved2;
    if (!br.ReadBits(4, &bs_code) || !br.ReadBits(4, &sr_code) ||
        !br.ReadBits(4, &ch_asgn) || !br.ReadBits(3, &ss_code) ||
        !br.ReadBits(1, &reserved2))
      return false;
    uint64_t coded_num;
    if (!ReadCodedNumber(&br, &coded_num)) return false;

    uint32_t block_size;
    if (bs_code == 0) return false;
    else if (bs_code == 1) block_size = 192;
    else if (bs_code <= 5) block_size = 576u << (bs_code - 2);
    else if (bs_code == 6) {
      uint64_t v;
      if (!br.ReadBits(8, &v)) return false;
      block_size = static_cast<uint32_t>(v) + 1;
    } else if (bs_code == 7) {
      uint64_t v;
      if (!br.ReadBits(16, &v)) return false;
      block_size = static_cast<uint32_t>(v) + 1;
    } else {
      block_size = 256u << (bs_code - 8);
    }

    if (sr_code == 12) {
      uint64_t v;
      if (!br.ReadBits(8, &v)) return false;
    } else if (sr_code == 13 || sr_code == 14) {
      uint64_t v;
      if (!br.ReadBits(16, &v)) return false;
    } else if (sr_code == 15) {
      return false;
    }

    int bps;
    switch (ss_code) {
      case 0: bps = static_cast<int>(info->bits_per_sample); break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return false;
    }
    uint64_t crc8;
    if (!br.ReadBits(8, &crc8)) return false;  // not verified

    uint32_t n_ch;
    if (ch_asgn <= 7) n_ch = static_cast<uint32_t>(ch_asgn) + 1;
    else if (ch_asgn <= 10) n_ch = 2;
    else return false;

    ch.resize(n_ch);
    for (uint32_t c = 0; c < n_ch; ++c) {
      int sub_bps = bps;
      // The side channel carries one extra bit.
      if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
          (ch_asgn == 10 && c == 1))
        sub_bps += 1;
      if (!DecodeSubframe(&br, block_size, sub_bps, &ch[c])) return false;
    }
    br.AlignByte();
    uint64_t crc16;
    if (!br.ReadBits(16, &crc16)) return false;  // not verified

    // Stereo decorrelation -> emit channel 0 (left).
    if (ch_asgn == 9) {  // right/side: ch0 = side, ch1 = right
      for (uint32_t i = 0; i < block_size; ++i)
        ch[0][i] = static_cast<int64_t>(static_cast<uint64_t>(ch[0][i]) +
                                        static_cast<uint64_t>(ch[1][i]));
    } else if (ch_asgn == 10) {  // mid/side
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t mid = static_cast<int64_t>(
            (static_cast<uint64_t>(ch[0][i]) << 1) |
            static_cast<uint64_t>(ch[1][i] & 1));
        ch[0][i] = static_cast<int64_t>(static_cast<uint64_t>(mid) +
                                        static_cast<uint64_t>(ch[1][i])) >> 1;
      }
    }
    // left/side (8): channel 0 is already left.

    for (uint32_t i = 0; i < block_size; ++i)
      out->push_back(static_cast<float>(ch[0][i]) * scale);
    if (out->size() > limit) return false;
  }
  if (info->num_frames && out->size() > info->num_frames)
    out->resize(info->num_frames);
  return true;
}

}  // namespace flacdec
