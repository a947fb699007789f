// Table-driven CAVLC VLC decode: two-level (8+8 bit) lookup tables
// built at static-init time from the normative (len, bits) code tables
// in cavlc_tables.h (ITU-T H.264 Tables 9-5/7/8/9/10). Replaces the
// per-bit linear scan (vlc_match) on the CAVLC hot path — coeff_token
// + total_zeros + run_before are ~half the decode time of a CAVLC
// stream. Differentially validated against the scan by the CAVLC
// sync-exactness tests (tests/test_codec.py) and the decoder fuzzer.
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

#include "bitreader.h"

namespace cova {

class VlcTable {
 public:
  // lens/bits: per-index code length (0 = unused slot) and code value
  // (MSB-first, `len` bits). n <= 256 indices; max code length 16.
  void build(const uint8_t* lens, const uint8_t* bits, int n) {
    memset(l1_, 0, sizeof(l1_));
    subs_.clear();
    for (int i = 0; i < n; i++) {
      int len = lens[i];
      if (len == 0) continue;
      uint32_t code = bits[i];
      if (len <= 8) {
        uint16_t e = (uint16_t)((len << 8) | i);
        int base = (int)(code << (8 - len));
        for (int f = 0; f < (1 << (8 - len)); f++) l1_[base + f] = e;
      } else {
        int p = (int)(code >> (len - 8));  // top 8 bits
        if (!(l1_[p] & 0x8000)) {
          l1_[p] = (uint16_t)(0x8000 | subs_.size());
          subs_.emplace_back();
          subs_.back().assign(256, 0);
        }
        auto& sub = subs_[l1_[p] & 0x7fff];
        int ls = len - 8;  // 1..8 remaining bits
        uint16_t e = (uint16_t)((len << 8) | i);
        int base = (int)((code & ((1u << ls) - 1)) << (8 - ls));
        for (int f = 0; f < (1 << (8 - ls)); f++) sub[base + f] = e;
      }
    }
  }

  // Decode one codeword; returns the table index or -1 (no match).
  int decode(BitReader& br) const {
    uint32_t w = br.peek_bits(16);
    uint16_t e = l1_[w >> 8];
    if (e & 0x8000) e = subs_[e & 0x7fff][w & 0xff];
    if (e == 0) return -1;
    br.consume(e >> 8);
    return e & 0xff;
  }

 private:
  uint16_t l1_[256];
  std::vector<std::vector<uint16_t>> subs_;
};

}  // namespace cova
