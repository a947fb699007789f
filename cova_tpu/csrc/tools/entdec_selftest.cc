// Self-test: entropy-decode a length-prefixed Annex-B stream (produced by
// make_test_stream) and report sync health per frame: early-terminate or
// overrun indicates a parse bug in that frame's syntax paths. Also pins
// the inline wire16 sink against a post-hoc export_packed16 every frame
// (the two must be byte-identical by construction; run across the whole
// x264 feature matrix by tests/test_codec.py).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include "../entdec.h"

using namespace cova;

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s STREAM.lp264 [nframes]\n", argv[0]); return 2; }
  int max_frames = argc > 2 ? atoi(argv[2]) : 1 << 30;
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 1; }
  EntropyDecoder dec(0);  // annex-b
  int frame = 0, bad = 0;
  uint32_t sz;
  std::vector<uint8_t> au;
  std::vector<uint8_t> sunk, ref;
  while (fread(&sz, 4, 1, f) == 1) {
    au.resize(sz);
    if (fread(au.data(), 1, sz, f) != sz) break;
    // Arm the inline wire16 sink once the grid is known (frame 0 pays
    // the post-hoc export); flags alternate to cover all 4 combos.
    bool nnz = frame & 1, smv = frame & 2;
    if (dec.mb_width()) {
      sunk.resize((size_t)dec.mb_width() * dec.mb_height() * 2);
      dec.set_wire_sink(sunk.data(), dec.mb_width(), dec.mb_height(), nnz,
                        smv);
    }
    FrameMeta meta;
    int rc = dec.decode_au(au.data(), au.size(), &meta);
    int undecoded = 0;
    for (auto c : meta.mb_class) if (c == MB_UNKNOWN) undecoded++;
    if (rc != 0 || undecoded) {
      printf("frame %d type %d rc=%d undecoded=%d/%zu\n", frame, meta.slice_type,
             rc, undecoded, meta.mb_class.size());
      bad++;
    }
    if (rc == 0 && dec.wire_complete(sunk.data())) {
      size_t grid = (size_t)dec.mb_width() * dec.mb_height();
      ref.resize(grid * 2);
      dec.export_packed16(ref.data(), nnz, smv);
      if (memcmp(sunk.data(), ref.data(), grid * 2) != 0) {
        printf("frame %d wire16 sink/export MISMATCH\n", frame);
        bad++;
      }
    }
    frame++;
    if (frame >= max_frames) break;
  }
  printf("%s: %d frames, %d bad\n", argv[1], frame, bad);
  return bad ? 1 : 0;
}
