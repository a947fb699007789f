// Bitstream reader for H.264 RBSP parsing (Exp-Golomb etc.).
// First-party implementation; replaces the bit parsing inside the
// reference's patched FFmpeg entropy decoder (reference contract:
// /root/reference/README.md:94-114).
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace cova {

// Strip emulation-prevention bytes (00 00 03 -> 00 00) from a NAL
// payload into `out` (cleared first), producing the RBSP. Chunked via
// memchr: emulation bytes are rare, so bulk-copy between candidates.
// Checking the two raw bytes preceding a 0x03 is equivalent to the
// sequential zero-run tracker because a removed byte is always 0x03
// (non-zero), which resets the run either way.
inline void ebsp_to_rbsp_into(const uint8_t* data, size_t size,
                              std::vector<uint8_t>* out) {
  out->clear();
  out->reserve(size);
  size_t i = 0;
  while (i < size) {
    const uint8_t* p =
        (const uint8_t*)memchr(data + i, 0x03, size - i);
    if (!p) {
      out->insert(out->end(), data + i, data + size);
      break;
    }
    size_t j = (size_t)(p - data);
    if (j >= 2 && data[j - 1] == 0 && data[j - 2] == 0) {
      out->insert(out->end(), data + i, data + j);  // drop the 0x03
    } else {
      out->insert(out->end(), data + i, data + j + 1);
    }
    i = j + 1;
  }
}

inline std::vector<uint8_t> ebsp_to_rbsp(const uint8_t* data, size_t size) {
  std::vector<uint8_t> out;
  ebsp_to_rbsp_into(data, size, &out);
  return out;
}

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size)
      : data_(data), size_(size), pos_(0) {}

  // Number of bits consumed so far.
  size_t bit_pos() const { return pos_; }
  size_t bits_left() const { return size_ * 8 - pos_; }

  uint32_t read_bit() {
    if (pos_ >= size_ * 8) {
      overrun_ = true;
      return 0;
    }
    uint32_t b = (data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    pos_++;
    return b;
  }

  uint32_t read_bits(int n) {
    size_t byte = pos_ >> 3;
    if (n > 0 && n <= 24 && byte + 4 <= size_) {
      // One 4-byte window read covers off + n <= 31 bits.
      uint32_t w = ((uint32_t)data_[byte] << 24) |
                   ((uint32_t)data_[byte + 1] << 16) |
                   ((uint32_t)data_[byte + 2] << 8) | data_[byte + 3];
      int off = (int)(pos_ & 7);
      pos_ += n;
      return (w << off) >> (32 - n);
    }
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | read_bit();
    return v;
  }

  // Non-consuming window read: the next n (<= 24) bits, zero-padded
  // past the stream end. Pair with consume() — the VLC fast paths peek
  // a window, table-match, then consume the matched length.
  uint32_t peek_bits(int n) const {
    size_t byte = pos_ >> 3;
    uint32_t w;
    if (byte + 4 <= size_) {
      w = ((uint32_t)data_[byte] << 24) | ((uint32_t)data_[byte + 1] << 16) |
          ((uint32_t)data_[byte + 2] << 8) | data_[byte + 3];
    } else {
      w = 0;
      for (int i = 0; i < 4; i++)
        w = (w << 8) | (byte + i < size_ ? data_[byte + i] : 0u);
    }
    return (w << (pos_ & 7)) >> (32 - n);
  }

  void consume(int n) {
    pos_ += (size_t)n;
    if (pos_ > size_ * 8) {
      pos_ = size_ * 8;
      overrun_ = true;
    }
  }

  // ue(v): unsigned Exp-Golomb. Fast path: one 24-bit peek + clz covers
  // codes up to 23 leading zeros (every code in real streams); the
  // bit-loop remains for longer (corrupt or near-end) cases.
  uint32_t read_ue() {
    uint32_t w = peek_bits(24);
    if (w) {
      int zeros = __builtin_clz(w) - 8;
      if (zeros * 2 + 1 <= 24) {
        // Whole code inside the window: value bits follow the 1.
        consume(zeros * 2 + 1);
        return ((1u << zeros) - 1) + ((w >> (24 - (zeros * 2 + 1))) &
                                      ((1u << zeros) - 1));
      }
      consume(zeros + 1);
      return ((1u << zeros) - 1) + read_bits(zeros);
    }
    int zeros = 0;
    while (read_bit() == 0 && zeros < 32 && !overrun_) zeros++;
    if (zeros == 0) return 0;
    if (zeros >= 32) {
      // >=32 leading zeros is not a valid Exp-Golomb code (and
      // 1u << 32 would be UB) — flag the stream as corrupt.
      overrun_ = true;
      return 0;
    }
    return ((1u << zeros) - 1) + read_bits(zeros);
  }

  // se(v): signed Exp-Golomb.
  int32_t read_se() {
    uint32_t u = read_ue();
    int32_t v = (u + 1) >> 1;
    return (u & 1) ? v : -v;
  }

  bool byte_aligned() const { return (pos_ & 7) == 0; }
  bool overrun() const { return overrun_; }

  // Advance past n bits without reading them (I_PCM raw samples).
  void skip(size_t n) {
    pos_ += n;
    if (pos_ > size_ * 8) {
      pos_ = size_ * 8;
      overrun_ = true;
    }
  }

  // more_rbsp_data(): true if there are bits before the rbsp_stop_bit.
  bool more_rbsp_data() const {
    if (pos_ >= size_ * 8) return false;
    // Find last byte with a set bit (the stop bit).
    size_t last = size_;
    while (last > 0 && data_[last - 1] == 0) last--;
    if (last == 0) return false;
    uint8_t b = data_[last - 1];
    int stop_bit_idx = 0;  // position of lowest set bit from LSB
    while (!((b >> stop_bit_idx) & 1)) stop_bit_idx++;
    size_t stop_pos = (last - 1) * 8 + (7 - stop_bit_idx);
    return pos_ < stop_pos;
  }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t pos_;
  bool overrun_ = false;
};

}  // namespace cova
