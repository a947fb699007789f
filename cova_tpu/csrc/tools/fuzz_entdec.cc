// Deterministic mutation fuzzer for the entropy decoder.
//
// The reference relies on Rust memory safety plus libavcodec's decades
// of fuzzing for its parsing robustness (SURVEY §5.2 — it ships no
// sanitizer harness of its own); our first-party C++ decoder needs an
// explicit one. This driver feeds structurally-corrupted access units
// (byte flips, truncations, duplicated NAL headers) through
// EntropyDecoder::decode_au and expects it to return an error code or
// metadata — never crash, hang, or touch memory out of bounds. Built
// with -fsanitize=address,undefined by the `fuzz` Makefile target and
// run in CI by tests/test_codec.py::TestFuzz.
//
// Every mutation is derived from a caller-provided seed via
// xorshift64*, so failures reproduce exactly: rerun with the printed
// seed and iteration count.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "../entdec.h"
#include "../mp4.h"

using namespace cova;

namespace {

uint64_t rng_state;

uint64_t rnd() {
  // xorshift64* — deterministic across platforms.
  rng_state ^= rng_state >> 12;
  rng_state ^= rng_state << 25;
  rng_state ^= rng_state >> 27;
  return rng_state * 0x2545F4914F6CDD1DULL;
}

void mutate(std::vector<uint8_t>* au) {
  if (au->empty()) return;
  switch (rnd() % 4) {
    case 0: {  // flip 1-16 random bytes
      int flips = 1 + (int)(rnd() % 16);
      for (int i = 0; i < flips; i++)
        (*au)[rnd() % au->size()] ^= (uint8_t)(1 + rnd() % 255);
      break;
    }
    case 1:  // truncate to a random prefix (NAL length fields now lie)
      au->resize(rnd() % au->size());
      break;
    case 2: {  // splice a random chunk over another position
      if (au->size() < 8) break;
      size_t len = 1 + rnd() % (au->size() / 2);
      size_t src = rnd() % (au->size() - len);
      size_t dst = rnd() % (au->size() - len);
      memmove(au->data() + dst, au->data() + src, len);
      break;
    }
    default: {  // zero or saturate a run (kills start codes / lengths)
      size_t len = 1 + rnd() % 32;
      size_t at = rnd() % au->size();
      len = len < au->size() - at ? len : au->size() - at;
      memset(au->data() + at, (rnd() & 1) ? 0xFF : 0x00, len);
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s FILE.mp4 [iters] [seed]\n", argv[0]);
    return 2;
  }
  long iters = argc > 2 ? atol(argv[2]) : 500;
  uint64_t seed = argc > 3 ? strtoull(argv[3], nullptr, 0) : 0x9E3779B97F4A7C15ULL;
  rng_state = seed ? seed : 1;

  // MP4 inputs fuzz per-sample AUs; anything else (.264 Annex-B,
  // .lp264 4-byte length-prefixed) fuzzes random windows of the raw
  // stream — in-band SPS/PPS NALs prime the decoder as they are hit,
  // exercising the CAVLC path and parameter-set parsing too.
  std::vector<std::vector<uint8_t>> aus;
  int nal_length_size = 0;
  Mp4File mp4;
  bool is_mp4 = mp4.open(argv[1]);
  if (is_mp4) {
    const Mp4Track& trk = mp4.track();
    nal_length_size = trk.nal_length_size;
    aus.resize(trk.samples.size());
    for (size_t i = 0; i < aus.size(); i++) mp4.read_sample(i, &aus[i]);
  } else {
    FILE* f = fopen(argv[1], "rb");
    if (!f) {
      fprintf(stderr, "open failed\n");
      return 1;
    }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw(sz > 0 ? (size_t)sz : 0);
    if (!raw.empty() && fread(raw.data(), 1, raw.size(), f) != raw.size()) {
      fclose(f);
      fprintf(stderr, "read failed\n");
      return 1;
    }
    fclose(f);
    const char* dot = strrchr(argv[1], '.');
    nal_length_size = 0;  // both raw formats carry Annex-B NALs
    if (dot && strcmp(dot, ".lp264") == 0) {
      // .lp264 (the oracle tooling's format): each access unit is a
      // little-endian u32 byte count followed by that many Annex-B
      // bytes. Split into real AUs.
      size_t off = 0;
      while (off + 4 <= raw.size()) {
        size_t len = (size_t)raw[off] | ((size_t)raw[off + 1] << 8) |
                     ((size_t)raw[off + 2] << 16) | ((size_t)raw[off + 3] << 24);
        if (len == 0 || off + 4 + len > raw.size()) break;
        aus.emplace_back(raw.begin() + off + 4, raw.begin() + off + 4 + len);
        off += 4 + len;
      }
    } else {
      // Annex-B: window the stream into ~32 KiB pseudo-AUs so state
      // accretes across iterations the way per-sample decoding would.
      const size_t kWin = 32 * 1024;
      for (size_t off = 0; off < raw.size(); off += kWin)
        aus.emplace_back(raw.begin() + off,
                         raw.begin() + (off + kWin < raw.size() ? off + kWin
                                                                : raw.size()));
    }
  }
  size_t n = aus.size();
  if (n == 0) {
    fprintf(stderr, "no samples\n");
    return 1;
  }

  EntropyDecoder dec(nal_length_size);
  if (is_mp4) {
    const Mp4Track& trk = mp4.track();
    for (const auto& s : trk.sps) dec.add_parameter_set(s.data(), s.size());
    for (const auto& s : trk.pps) dec.add_parameter_set(s.data(), s.size());
  }

  long ok = 0, rejected = 0;
  for (long it = 0; it < iters; it++) {
    // Mix clean AUs in (1 of 4) so the DPB/refs reach realistic states
    // between corrupted pictures instead of resetting to a cold path.
    std::vector<uint8_t> au = aus[rnd() % n];
    bool clean = (rnd() % 4) == 0;
    if (!clean) mutate(&au);
    FrameMeta meta;
    int rc = dec.decode_au(au.data(), au.size(), &meta);
    if (rc == 0)
      ok++;
    else
      rejected++;
    if ((it + 1) % 500 == 0)
      fprintf(stderr, "  iter %ld/%ld (decoded %ld, rejected %ld)\n", it + 1,
              iters, ok, rejected);
  }
  printf("fuzz OK: %ld iters (seed %#llx): %ld decoded, %ld rejected\n", iters,
         (unsigned long long)seed, ok, rejected);
  return 0;
}
