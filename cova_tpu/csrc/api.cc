// C API for ctypes binding (cova_tpu/codec/__init__.py).
//
// Replaces the reference's GStreamer element graph plumbing with three
// host-side services:
//   * MP4 demux + GoP index       (reference: qtdemux/h264parse/gopsplit)
//   * batch entropy decode        (reference: 32x patched avdec_h264)
//   * selective pixel decode      (reference: nvv4l2decoder / NVDEC)
// Batch entropy decode is parallel at FRAME granularity (parsing has no
// inter-picture dependencies), strictly more parallel than the
// reference's GoP fan-out (gstgopsplit.cpp:501-661).

#include <atomic>
#include <cstring>
#include <deque>
#include <memory>
#include <thread>
#include <vector>

#include "entdec.h"
#include "mp4.h"
#include "pixdec.h"

using namespace cova;

extern "C" {

// ---------------------------------------------------------------------------
// MP4 demuxer
// ---------------------------------------------------------------------------

void* cova_mp4_open(const char* path) {
  auto* f = new Mp4File();
  if (!f->open(path)) {
    delete f;
    return nullptr;
  }
  return f;
}

void cova_mp4_close(void* h) { delete (Mp4File*)h; }

int cova_mp4_num_samples(void* h) {
  return (int)((Mp4File*)h)->track().samples.size();
}

int cova_mp4_num_gops(void* h) { return (int)((Mp4File*)h)->gops().size(); }

void cova_mp4_gop_info(void* h, int g, uint32_t* first, uint32_t* count) {
  const auto& gops = ((Mp4File*)h)->gops();
  *first = gops[g].first_sample;
  *count = gops[g].num_samples;
}

void cova_mp4_track_info(void* h, int* width, int* height, uint32_t* timescale,
                         int* nal_length_size) {
  const Mp4Track& t = ((Mp4File*)h)->track();
  *width = t.width;
  *height = t.height;
  *timescale = t.timescale;
  *nal_length_size = t.nal_length_size;
}

void cova_mp4_sample_info(void* h, int idx, uint32_t* size, int64_t* dts,
                          int64_t* pts, int* keyframe) {
  const Mp4Sample& s = ((Mp4File*)h)->track().samples[idx];
  *size = s.size;
  *dts = s.dts;
  *pts = s.pts;
  *keyframe = s.keyframe ? 1 : 0;
}

int cova_mp4_read_sample(void* h, int idx, uint8_t* buf, int cap) {
  std::vector<uint8_t> tmp;
  if (!((Mp4File*)h)->read_sample(idx, &tmp)) return -1;
  if ((int)tmp.size() > cap) return -1;
  memcpy(buf, tmp.data(), tmp.size());
  return (int)tmp.size();
}

// Rebuild an avcC extradata blob from the stored parameter sets.
int cova_mp4_extradata(void* h, uint8_t* buf, int cap) {
  const Mp4Track& t = ((Mp4File*)h)->track();
  std::vector<uint8_t> out;
  if (t.sps.empty()) return -1;
  const auto& sps = t.sps[0];
  out.push_back(1);
  out.push_back(sps.size() > 1 ? sps[1] : 0);
  out.push_back(sps.size() > 2 ? sps[2] : 0);
  out.push_back(sps.size() > 3 ? sps[3] : 0);
  out.push_back(0xfc | (t.nal_length_size - 1));
  out.push_back(0xe0 | (uint8_t)t.sps.size());
  for (const auto& s : t.sps) {
    out.push_back((uint8_t)(s.size() >> 8));
    out.push_back((uint8_t)s.size());
    out.insert(out.end(), s.begin(), s.end());
  }
  out.push_back((uint8_t)t.pps.size());
  for (const auto& p : t.pps) {
    out.push_back((uint8_t)(p.size() >> 8));
    out.push_back((uint8_t)p.size());
    out.insert(out.end(), p.begin(), p.end());
  }
  if ((int)out.size() > cap) return -1;
  memcpy(buf, out.data(), out.size());
  return (int)out.size();
}

// ---------------------------------------------------------------------------
// Batch entropy decode
// ---------------------------------------------------------------------------

// Decode an explicit sample-index list with `threads` workers (used for
// display-order decode: AU parsing is picture-independent, so arbitrary
// order is fine). Outputs as in cova_entdec_decode_range.
int cova_entdec_decode_indices(void* h, const int32_t* indices, int count,
                               int threads, int mb_w, int mb_h,
                               uint8_t* mb_class, int16_t* mv_x, int16_t* mv_y,
                               uint16_t* nnz, uint8_t* slice_types) {
  Mp4File* f = (Mp4File*)h;
  const Mp4Track& track = f->track();
  if (threads < 1) threads = 1;
  size_t grid = (size_t)mb_w * mb_h;
  std::atomic<int> next(0);

  auto worker = [&]() {
    EntropyDecoder dec(track.nal_length_size);
    for (const auto& s : track.sps) dec.add_parameter_set(s.data(), s.size());
    for (const auto& p : track.pps) dec.add_parameter_set(p.data(), p.size());
    std::vector<uint8_t> au;
    FrameMeta meta;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= count) break;
      int idx = indices[i];
      uint8_t* cls = mb_class + (size_t)i * grid;
      int16_t* mx = mv_x + (size_t)i * grid;
      int16_t* my = mv_y + (size_t)i * grid;
      uint16_t* nz = nnz + (size_t)i * grid;
      if (idx < 0 || idx >= (int)track.samples.size() ||
          !f->read_sample(idx, &au) ||
          dec.decode_au(au.data(), au.size(), &meta) != 0 ||
          meta.mb_width != mb_w || meta.mb_height != mb_h) {
        slice_types[i] = 255;
        memset(cls, MB_UNKNOWN, grid);
        memset(mx, 0, grid * sizeof(int16_t));
        memset(my, 0, grid * sizeof(int16_t));
        memset(nz, 0, grid * sizeof(uint16_t));
        continue;
      }
      slice_types[i] = (uint8_t)meta.slice_type;
      memcpy(cls, meta.mb_class.data(), grid);
      memcpy(mx, meta.mv_x.data(), grid * sizeof(int16_t));
      memcpy(my, meta.mv_y.data(), grid * sizeof(int16_t));
      memcpy(nz, meta.nnz.data(), grid * sizeof(uint16_t));
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < threads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// Decode an explicit sample-index list directly into the packed u8
// BlobNet input layout [mb_class, |mv_x|/4, |mv_y|/4(, nnz/4)] — the
// pack_metadata transform (cova_tpu/utils/dataset.py:54-69) fused into
// the decode workers, saving a python-side int16->u8 pass per chunk on
// the pipeline's hot path. `out` is count*mb_h*mb_w*channels bytes.
int cova_entdec_decode_indices_packed(void* h, const int32_t* indices,
                                      int count, int threads, int mb_w,
                                      int mb_h, int channels, uint8_t* out,
                                      uint8_t* slice_types) {
  if (channels != 3 && channels != 4) return -2;
  Mp4File* f = (Mp4File*)h;
  const Mp4Track& track = f->track();
  if (threads < 1) threads = 1;
  size_t grid = (size_t)mb_w * mb_h;
  std::atomic<int> next(0);

  auto worker = [&]() {
    EntropyDecoder dec(track.nal_length_size);
    for (const auto& s : track.sps) dec.add_parameter_set(s.data(), s.size());
    for (const auto& p : track.pps) dec.add_parameter_set(p.data(), p.size());
    std::vector<uint8_t> au;
    FrameMeta meta;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= count) break;
      int idx = indices[i];
      uint8_t* dst = out + (size_t)i * grid * channels;
      if (idx < 0 || idx >= (int)track.samples.size() ||
          !f->read_sample(idx, &au) ||
          dec.decode_au(au.data(), au.size(), &meta) != 0 ||
          meta.mb_width != mb_w || meta.mb_height != mb_h) {
        slice_types[i] = 255;
        memset(dst, 0, grid * channels);
        for (size_t k = 0; k < grid; k++) dst[k * channels] = MB_UNKNOWN;
        continue;
      }
      slice_types[i] = (uint8_t)meta.slice_type;
      for (size_t k = 0; k < grid; k++) {
        uint8_t* p8 = dst + k * channels;
        p8[0] = meta.mb_class[k];
        // mean |mv| per MB, quarter-pel -> full-pel, saturated u8.
        int mx = meta.mv_x[k] >> 2;
        int my = meta.mv_y[k] >> 2;
        p8[1] = (uint8_t)(mx > 255 ? 255 : mx);
        p8[2] = (uint8_t)(my > 255 ? 255 : my);
        if (channels == 4) {
          int nz = meta.nnz[k] >> 2;
          p8[3] = (uint8_t)(nz > 255 ? 255 : nz);
        }
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < threads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// Decode samples [start, start+count) of the file with `threads` workers.
// Outputs are per-frame macroblock grids, flattened frame-major:
//   mb_class/mv_x/mv_y/nnz: count * mb_w * mb_h entries
//   slice_types: count entries (0 P, 1 B, 2 I, 255 = error)
// Returns 0 on success (individual frame errors flagged in slice_types).
int cova_entdec_decode_range(void* h, int start, int count, int threads,
                             int mb_w, int mb_h, uint8_t* mb_class,
                             int16_t* mv_x, int16_t* mv_y, uint16_t* nnz,
                             uint8_t* slice_types) {
  Mp4File* f = (Mp4File*)h;
  const Mp4Track& track = f->track();
  if (threads < 1) threads = 1;
  size_t grid = (size_t)mb_w * mb_h;
  std::atomic<int> next(0);
  std::atomic<int> errors(0);

  auto worker = [&]() {
    EntropyDecoder dec(track.nal_length_size);
    for (const auto& s : track.sps) dec.add_parameter_set(s.data(), s.size());
    for (const auto& p : track.pps) dec.add_parameter_set(p.data(), p.size());
    std::vector<uint8_t> au;
    FrameMeta meta;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= count) break;
      int idx = start + i;
      uint8_t* cls = mb_class + (size_t)i * grid;
      int16_t* mx = mv_x + (size_t)i * grid;
      int16_t* my = mv_y + (size_t)i * grid;
      uint16_t* nz = nnz + (size_t)i * grid;
      if (!f->read_sample(idx, &au) ||
          dec.decode_au(au.data(), au.size(), &meta) != 0 ||
          meta.mb_width != mb_w || meta.mb_height != mb_h) {
        slice_types[i] = 255;
        memset(cls, MB_UNKNOWN, grid);
        memset(mx, 0, grid * sizeof(int16_t));
        memset(my, 0, grid * sizeof(int16_t));
        memset(nz, 0, grid * sizeof(uint16_t));
        errors.fetch_add(1);
        continue;
      }
      slice_types[i] = (uint8_t)meta.slice_type;
      memcpy(cls, meta.mb_class.data(), grid);
      memcpy(mx, meta.mv_x.data(), grid * sizeof(int16_t));
      memcpy(my, meta.mv_y.data(), grid * sizeof(int16_t));
      memcpy(nz, meta.nnz.data(), grid * sizeof(uint16_t));
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < threads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// ---------------------------------------------------------------------------
// Pixel decoder
// ---------------------------------------------------------------------------

struct PixDecHandle {
  std::unique_ptr<PixelDecoder> dec;
  std::deque<DecodedFrame> frames;
  DecodedFrame last;  // last popped frame (for MV queries)
};

void* cova_pixdec_create(const uint8_t* extradata, int size, int export_mvs) {
  auto* h = new PixDecHandle();
  h->dec.reset(new PixelDecoder(extradata, (size_t)size, export_mvs != 0));
  if (!h->dec->ok()) {
    delete h;
    return nullptr;
  }
  return h;
}

void cova_pixdec_destroy(void* hv) { delete (PixDecHandle*)hv; }

// Send one AU; returns number of frames now queued, or -1 on error.
int cova_pixdec_send(void* hv, const uint8_t* au, int size, int64_t pts) {
  auto* h = (PixDecHandle*)hv;
  std::vector<DecodedFrame> out;
  if (!h->dec->send(au, (size_t)size, pts, &out)) return -1;
  for (auto& f : out) h->frames.push_back(std::move(f));
  return (int)h->frames.size();
}

int cova_pixdec_flush(void* hv) {
  auto* h = (PixDecHandle*)hv;
  std::vector<DecodedFrame> out;
  if (!h->dec->flush(&out)) return -1;
  for (auto& f : out) h->frames.push_back(std::move(f));
  return (int)h->frames.size();
}

// Pop the oldest queued frame into caller I420 buffers. Returns 1 on
// success, 0 if queue empty. Buffers must hold w*h and (w/2)*(h/2).
int cova_pixdec_pop(void* hv, uint8_t* y, uint8_t* u, uint8_t* v,
                    int64_t* pts, int* width, int* height) {
  auto* h = (PixDecHandle*)hv;
  if (h->frames.empty()) return 0;
  h->last = std::move(h->frames.front());
  h->frames.pop_front();
  *pts = h->last.pts;
  *width = h->last.width;
  *height = h->last.height;
  if (y) memcpy(y, h->last.y.data(), h->last.y.size());
  if (u) memcpy(u, h->last.u.data(), h->last.u.size());
  if (v) memcpy(v, h->last.v.data(), h->last.v.size());
  return 1;
}

// Motion vectors of the last popped frame: 7 int32 per record
// {mx_q4, my_q4, dst_x, dst_y, w, h, source}. Returns record count.
int cova_pixdec_last_mvs(void* hv, int32_t* buf, int cap_records) {
  auto* h = (PixDecHandle*)hv;
  int n = (int)(h->last.mvs.size() / 7);
  if (!buf) return n;
  if (n > cap_records) n = cap_records;
  memcpy(buf, h->last.mvs.data(), (size_t)n * 7 * sizeof(int32_t));
  return n;
}

}  // extern "C"
