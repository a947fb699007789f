// CABAC arithmetic decoding engine — ITU-T H.264 clause 9.3.3.2,
// implemented from the spec decode flow (DecodeDecision / DecodeBypass /
// DecodeTerminate) with the normative tables in cabac_engine_tables.h /
// cabac_tables.h.
//
// This is the heart of the entropy-only decoder that replaces the
// reference's patched FFmpeg avdec_h264 (reference contract:
// /root/reference/README.md:94-114 — entropy decode without IDCT/MC).
#pragma once

#include <cstdint>
#include <cstring>

#include "cabac_engine_tables.h"
#include "cabac_tables.h"

namespace cova {

// Context variables are stored packed as (state << 1) | valMPS so a bin
// decode touches one byte instead of two; the packed successor values
// for the MPS and LPS paths (9.3.3.2.1.1, incl. the valMPS flip at
// state 0) are precomputed per packed value.
struct CabacPackedTrans {
  uint8_t mps_next[128];
  uint8_t lps_next[128];
  CabacPackedTrans() {
    for (int s = 0; s < 64; s++)
      for (int m = 0; m < 2; m++) {
        int v = (s << 1) | m;
        mps_next[v] = (uint8_t)(((s < 62 ? s + 1 : 62) << 1) | m);
        int lps_m = s == 0 ? m ^ 1 : m;
        lps_next[v] = (uint8_t)((kTransIdxLPS[s] << 1) | lps_m);
      }
  }
};
inline const CabacPackedTrans kPackedTrans;

class CabacDecoder {
 public:
  // `data`/`size`: RBSP bytes; `bit_offset` must be byte-aligned
  // (cabac_alignment_one_bit already consumed by the caller).
  void init_engine(const uint8_t* data, size_t size, size_t bit_offset) {
    data_ = data;
    size_ = size;
    pos_ = bit_offset;
    range_ = 510;
    offset_ = 0;
    overrun_ = false;
    for (int i = 0; i < 9; i++) offset_ = (offset_ << 1) | read_bit();
  }

  // 9.3.1.1 context variable initialization.
  void init_contexts(bool intra_slice, int cabac_init_idc, int qp) {
    const int8_t(*tab)[2] =
        intra_slice ? kCabacInitI : kCabacInitPB[cabac_init_idc];
    int qpc = qp < 0 ? 0 : (qp > 51 ? 51 : qp);
    for (int i = 0; i < 1024; i++) {
      int m = tab[i][0], n = tab[i][1];
      int pre = ((m * qpc) >> 4) + n;
      pre = pre < 1 ? 1 : (pre > 126 ? 126 : pre);
      if (pre <= 63)
        ctx_[i] = (uint8_t)((63 - pre) << 1);
      else
        ctx_[i] = (uint8_t)(((pre - 64) << 1) | 1);
    }
  }

  // Optional per-bin trace hook (entdec sets this in trace mode).
  void (*trace_fn)(int ctx, int bin) = nullptr;

  int decision(int ctx) {
    uint8_t v = ctx_[ctx];  // (state << 1) | valMPS
    uint32_t q = (range_ >> 6) & 3;
    uint32_t r_lps = kRangeTabLPS[v >> 1][q];
    range_ -= r_lps;
    int bit;
    if (offset_ >= range_) {
      // LPS path
      offset_ -= range_;
      range_ = r_lps;
      bit = (v & 1) ^ 1;
      ctx_[ctx] = kPackedTrans.lps_next[v];
    } else {
      bit = v & 1;
      ctx_[ctx] = kPackedTrans.mps_next[v];
    }
    renorm();
    if (trace_fn) trace_fn(ctx, bit);
    return bit;
  }

  int bypass() {
    offset_ = (offset_ << 1) | read_bit();
    if (offset_ >= range_) {
      offset_ -= range_;
      return 1;
    }
    return 0;
  }

  int terminate() {
    range_ -= 2;
    if (offset_ >= range_) return 1;
    renorm();
    return 0;
  }

  // Raw bit position of the pcm samples following an I_PCM terminate
  // bin of 1. The encoder's flush (9.3.4.6: RenormE from codIRange=2 +
  // PutBit + WriteBits) emits R+10 bits for shared renormalization
  // count R, minus the one bit absorbed by firstBitFlag at engine init
  // — exactly matching the 9+R bits this decoder has fetched. The
  // pcm_alignment_zero_bits then pad to the next byte boundary, so the
  // samples start at align-up(pos_). Validated bin-exact against
  // libavcodec's bytestream-rewind recovery on x264 lossless streams
  // with chained and interleaved I_PCM (tests/test_codec.py TestIPcm).
  size_t pcm_data_pos() const { return (pos_ + 7) & ~(size_t)7; }

  // 9.3.1.2: re-initialization of the decoding engine after pcm data.
  // Only the engine restarts (at the given byte-aligned bit offset);
  // context variables persist.
  void reinit_at(size_t bit_offset) {
    pos_ = bit_offset;
    range_ = 510;
    offset_ = 0;
    for (int i = 0; i < 9; i++) offset_ = (offset_ << 1) | read_bit();
  }

  // Unary-truncated / Exp-Golomb helpers used by several syntax elements.
  uint32_t bypass_eg(int k) {  // UEGk suffix (exp-golomb order k), bypass
    uint32_t v = 0;
    int leading = 0;
    while (bypass() && leading < 32) leading++;
    if (leading >= 32) {
      // No conforming UEGk prefix is this long (and 1u << 32 is UB) —
      // corrupt stream.
      overrun_ = true;
      return 0;
    }
    int bits = leading + k;
    for (int i = 0; i < bits; i++) v = (v << 1) | bypass();
    return v + (((1u << leading) - 1) << k);
  }

  bool overrun() const { return overrun_; }
  size_t bit_pos() const { return pos_; }

 private:
  void renorm() {
    if (range_ >= 256) return;
    // Doublings needed to reach [256, 512): 9 - bit_length(range_).
    int n = 9 - (32 - __builtin_clz(range_));
    range_ <<= n;
    offset_ = (offset_ << n) | read_bits(n);
  }

  uint32_t read_bit() {
    if (pos_ >= size_ * 8) {
      overrun_ = true;
      return 0;
    }
    uint32_t b = (data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    pos_++;
    return b;
  }

  // Up to 9 bits in one window read (renorm / engine init).
  uint32_t read_bits(int n) {
    size_t byte = pos_ >> 3;
    if (byte + 3 <= size_) {  // 3-byte window fully in range
      uint32_t w = ((uint32_t)data_[byte] << 16) |
                   ((uint32_t)data_[byte + 1] << 8) | data_[byte + 2];
      int off = (int)(pos_ & 7);
      pos_ += n;
      return (w >> (24 - off - n)) & ((1u << n) - 1);
    }
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | read_bit();
    return v;
  }

  const uint8_t* data_ = nullptr;
  size_t size_ = 0;
  size_t pos_ = 0;
  uint32_t range_ = 510;
  uint32_t offset_ = 0;
  bool overrun_ = false;
  uint8_t ctx_[1024];  // packed (state << 1) | valMPS per context
};

}  // namespace cova
