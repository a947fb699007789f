// Throughput bench for the entropy decoder: decode every AU of an MP4
// N times, print fps. Built by tools/Makefile with and without -pg for
// gprof profiling of the hot loops.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "../entdec.h"
#include "../mp4.h"

using namespace cova;

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s FILE.mp4 [passes] [meta|packed]\n", argv[0]);
    return 2;
  }
  int passes = argc > 2 ? atoi(argv[2]) : 1;
  // "packed" measures header decode + fused 4-byte packed export;
  // "packed16" measures the CURRENT pipeline production path (2-byte
  // wire16 export, signed mv + nnz — what entropy_decode_packed16
  // ships to the device); default "meta" keeps the historical numbers
  // comparable (full FrameMeta export).
  bool packed = argc > 3 && argv[3][0] == 'p';
  bool wire16 = packed && argv[3][6] == '1';
  Mp4File mp4;
  if (!mp4.open(argv[1])) {
    fprintf(stderr, "open failed\n");
    return 1;
  }
  const Mp4Track& trk = mp4.track();
  size_t n = trk.samples.size();
  // Preload all sample bytes so file IO is out of the measurement.
  std::vector<std::vector<uint8_t>> aus(n);
  for (size_t i = 0; i < n; i++) mp4.read_sample(i, &aus[i]);

  timespec c0;
  clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &c0);
  auto t0 = std::chrono::steady_clock::now();
  long frames = 0;
  std::vector<uint8_t> pbuf;
  for (int p = 0; p < passes; p++) {
    EntropyDecoder dec(trk.nal_length_size);
    dec.export_sums = !packed;  // pipeline handles set export_sums=false
    for (const auto& s : trk.sps) dec.add_parameter_set(s.data(), s.size());
    for (const auto& s : trk.pps) dec.add_parameter_set(s.data(), s.size());
    for (size_t i = 0; i < n; i++) {
      int rc;
      if (packed) {
        // wire16 production path: arm the inline sink once the grid is
        // known (frame 0 pays the post-hoc export) — same flow as
        // cova_entdec_decode_indices_packed16.
        if (wire16 && dec.mb_width()) {
          size_t grid = (size_t)dec.mb_width() * dec.mb_height();
          pbuf.resize(grid * 2);
          dec.set_wire_sink(pbuf.data(), dec.mb_width(), dec.mb_height(),
                            true, true);
        }
        rc = dec.decode_au_header(aus[i].data(), aus[i].size());
        if (rc == 0) {
          size_t grid = (size_t)dec.mb_width() * dec.mb_height();
          if (wire16) {
            pbuf.resize(grid * 2);
            if (!dec.wire_complete(pbuf.data()))
              dec.export_packed16(pbuf.data(), true, true);
          } else {
            pbuf.resize(grid * 4);
            dec.export_packed(pbuf.data(), 4, true);
          }
        }
      } else {
        FrameMeta meta;
        rc = dec.decode_au(aus[i].data(), aus[i].size(), &meta);
      }
      if (rc != 0) {
        fprintf(stderr, "decode_au failed at %zu\n", i);
        return 1;
      }
      frames++;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  timespec c1;
  clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &c1);
  double el = std::chrono::duration<double>(t1 - t0).count();
  // CPU time excludes involuntary preemption / VM steal — the stable
  // A/B metric on this shared host (wall clock drifts 30-40%).
  double cpu = (c1.tv_sec - c0.tv_sec) + 1e-9 * (c1.tv_nsec - c0.tv_nsec);
  printf("%ld frames in %.3f s = %.1f fps (cpu %.3f s = %.1f fps)\n",
         frames, el, frames / el, cpu, frames / cpu);
  return 0;
}
