// Dump per-MB exported MV metadata (mean |mv| per axis, quarter-pel)
// for every AU of a length-prefixed Annex-B stream, one line per frame:
//   F <idx> <slice_type> <mv_x values...> <mv_y values...>
// Used by tests/test_codec.py to compare direct-mode B MVs against
// libavcodec's export_mvs side data.
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "../entdec.h"

using namespace cova;

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s STREAM.lp264 [nframes]\n", argv[0]);
    return 2;
  }
  int max_frames = argc > 2 ? atoi(argv[2]) : 1 << 30;
  FILE* f = fopen(argv[1], "rb");
  if (!f) {
    perror("open");
    return 1;
  }
  EntropyDecoder dec(0);
  uint32_t sz;
  std::vector<uint8_t> au;
  int idx = 0;
  while (fread(&sz, 4, 1, f) == 1 && idx < max_frames) {
    au.resize(sz);
    if (fread(au.data(), 1, sz, f) != sz) break;
    FrameMeta meta;
    if (dec.decode_au(au.data(), au.size(), &meta) != 0) {
      fprintf(stderr, "decode failed at %d\n", idx);
      return 1;
    }
    // Per-MB |mv| SUMS over both lists (quarter-pel): comparable with
    // libavcodec's export even where it pads unused partition lists
    // with zero vectors (zeros don't change a sum).
    printf("F %d %d", idx, meta.slice_type);
    for (auto v : meta.mv_sum_x) printf(" %d", (int)v);
    for (auto v : meta.mv_sum_y) printf(" %d", (int)v);
    // Trailing per-MB mb_field_decoding_flag (MBAFF; all-zero for
    // progressive): consumers slicing the first 2*W*H values are
    // unaffected; the MBAFF MV comparison needs the field map because
    // exported field-MB mv_y is doubled to frame units.
    for (auto v : meta.mb_field) printf(" %d", (int)v);
    printf("\n");
    if (getenv("COVA_MVDUMP_CELLS")) {
      // Per-cell motion dump ("C <frame> <mb> <class> <cells...>"):
      // 16 cells x [l0x l0y l1x l1y] with 9999 marking an unused list.
      // Raster MB order; field-MB mv_y left in CODE units (the consumer
      // owns unit normalization). Used by the MBAFF B-direct validation
      // to simulate libavcodec's export collapse of direct MBs.
      size_t n = (size_t)meta.mb_width * meta.mb_height;
      for (size_t i = 0; i < n; i++) {
        printf("C %d %zu %d", idx, i, (int)meta.mb_class[i]);
        for (int c = 0; c < 16; c++)
          for (int l = 0; l < 2; l++) {
            int ref, mv[2];
            if (dec.debug_cell_mv(i, c, l, &ref, mv))
              printf(" %d %d", mv[0], mv[1]);
            else
              printf(" 9999 9999");
          }
        printf("\n");
      }
    }
    idx++;
  }
  return 0;
}
