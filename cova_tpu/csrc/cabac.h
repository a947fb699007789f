// CABAC arithmetic decoding engine — ITU-T H.264 clause 9.3.3.2,
// implemented from the spec decode flow (DecodeDecision / DecodeBypass /
// DecodeTerminate) with the normative tables in cabac_engine_tables.h /
// cabac_tables.h.
//
// This is the heart of the entropy-only decoder that replaces the
// reference's patched FFmpeg avdec_h264 (reference contract:
// /root/reference/README.md:94-114 — entropy decode without IDCT/MC).
//
// Engine representation (the throughput-critical design choice): the
// spec's codIOffset is kept PRE-SCALED inside a 64-bit window,
//
//   low_ = codIOffset * 2^s_ + (next s_ bits of the stream)
//
// so the spec's per-renormalization "shift in one bit" (9.3.3.2.2)
// becomes a plain decrement of s_ — no memory access — and the stream
// is touched only when the window drains (refill of 32 bits every
// couple dozen bins). codIOffset >= codIRange compares exactly as
// low_ >= range_ << s_ because the prefetched tail is < 2^s_. The
// same trick makes DecodeBypass branch-free on memory.
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
    overrun_ = false;
    start_window(bit_offset);
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
    uint64_t thr = (uint64_t)range_ << s_;
    // NB: a branchless cmov-select variant of this (r_mps/r_lps picked
    // by `low_ >= thr`) measured ~4% SLOWER min-of-6 cpu-time A/B —
    // the PGO'd branch predicts well on real streams; keep the branch.
    int bit;
    if (low_ >= thr) {
      // LPS path
      low_ -= thr;
      range_ = r_lps;
      bit = (v & 1) ^ 1;
      ctx_[ctx] = kPackedTrans.lps_next[v];
    } else {
      bit = v & 1;
      ctx_[ctx] = kPackedTrans.mps_next[v];
    }
    // Renormalization: doublings to reach [256, 512) are absorbed by
    // the window exponent (9 - bit_length(range)).
    int n = __builtin_clz(range_) - 23;
    range_ <<= n;
    s_ -= n;
    if (s_ < 16) refill();
    if (trace_fn) trace_fn(ctx, bit);
    return bit;
  }

  int bypass() {
    s_--;
    uint64_t thr = (uint64_t)range_ << s_;
    int bit = low_ >= thr;
    low_ -= bit ? thr : 0;
    if (s_ < 16) refill();
    return bit;
  }

  int terminate() {
    range_ -= 2;
    uint64_t thr = (uint64_t)range_ << s_;
    if (low_ >= thr) return 1;
    int n = __builtin_clz(range_) - 23;
    range_ <<= n;
    s_ -= n;
    if (s_ < 16) refill();
    return 0;
  }

  // Raw bit position of the pcm samples following an I_PCM terminate
  // bin of 1. The encoder's flush (9.3.4.6: RenormE from codIRange=2 +
  // PutBit + WriteBits) emits R+10 bits for shared renormalization
  // count R, minus the one bit absorbed by firstBitFlag at engine init
  // — exactly matching the 9+R bits this decoder has fetched. The
  // pcm_alignment_zero_bits then pad to the next byte boundary, so the
  // samples start at align-up(pos). Validated bin-exact against
  // libavcodec's bytestream-rewind recovery on x264 lossless streams
  // with chained and interleaved I_PCM (tests/test_codec.py TestIPcm).
  size_t pcm_data_pos() const { return (bit_pos() + 7) & ~(size_t)7; }

  // 9.3.1.2: re-initialization of the decoding engine after pcm data.
  // Only the engine restarts (at the given byte-aligned bit offset);
  // context variables persist.
  void reinit_at(size_t bit_offset) { start_window(bit_offset); }

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
  // Consumed (arithmetic) bit position: bits fetched minus prefetch.
  size_t bit_pos() const { return 8 * next_byte_ - (size_t)s_; }

 private:
  // Begin a fresh arithmetic window at a byte-aligned bit offset: the
  // spec's 9-bit codIOffset preload becomes "fetch 32 bits, treat the
  // top 9 as codIOffset and the remaining 23 as prefetch".
  void start_window(size_t bit_offset) {
    next_byte_ = bit_offset >> 3;
    range_ = 510;
    low_ = 0;
    s_ = 0;
    refill();   // 32 bits in
    s_ -= 9;    // top 9 bits form the initial codIOffset
  }

  void refill() {
    uint32_t w;
    if (next_byte_ + 4 <= size_) {
      uint32_t be;
      memcpy(&be, data_ + next_byte_, 4);
      w = __builtin_bswap32(be);
    } else {
      // Tail: pad with zeros; consuming past the stream end flags
      // overrun (checked on the consumed position, not the prefetch —
      // fetching ahead of the arithmetic position is normal).
      w = 0;
      for (int i = 0; i < 4; i++)
        w = (w << 8) |
            (next_byte_ + i < size_ ? data_[next_byte_ + i] : 0u);
      if (8 * next_byte_ > 8 * size_ + (size_t)(s_ > 0 ? s_ : 0))
        overrun_ = true;
    }
    low_ = (low_ << 32) | w;
    s_ += 32;
    next_byte_ += 4;
  }

  const uint8_t* data_ = nullptr;
  size_t size_ = 0;
  size_t next_byte_ = 0;
  uint64_t low_ = 0;   // codIOffset * 2^s_ + prefetched bits
  int s_ = 0;          // prefetched bit count (invariant: 16 <= s_ < 48)
  uint32_t range_ = 510;
  bool overrun_ = false;
  uint8_t ctx_[1024];  // packed (state << 1) | valMPS per context
};

}  // namespace cova
