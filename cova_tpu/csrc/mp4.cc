#include "mp4.h"

#include <cstdio>
#include <cstring>
#include <memory>

namespace cova {

namespace {

struct Reader {
  FILE* f;
  bool ok = true;
  uint64_t pos = 0;

  explicit Reader(FILE* file) : f(file) {}
  void seek(uint64_t off) {
    ok = ok && fseeko(f, (off_t)off, SEEK_SET) == 0;
    pos = off;
  }
  bool read(void* buf, size_t n) {
    if (!ok) return false;
    ok = fread(buf, 1, n, f) == n;
    pos += n;
    return ok;
  }
  uint8_t u8() {
    uint8_t b = 0;
    read(&b, 1);
    return b;
  }
  uint16_t u16() {
    uint8_t b[2] = {0};
    read(b, 2);
    return (uint16_t)(b[0] << 8 | b[1]);
  }
  uint32_t u32() {
    uint8_t b[4] = {0};
    read(b, 4);
    return (uint32_t)b[0] << 24 | (uint32_t)b[1] << 16 | (uint32_t)b[2] << 8 |
           b[3];
  }
  uint64_t u64() {
    uint64_t hi = u32();
    return hi << 32 | u32();
  }
};

struct Box {
  uint32_t type = 0;
  uint64_t payload_start = 0;
  uint64_t payload_end = 0;
};

constexpr uint32_t fourcc(const char (&s)[5]) {
  return (uint32_t)s[0] << 24 | (uint32_t)s[1] << 16 | (uint32_t)s[2] << 8 |
         (uint32_t)s[3];
}

// Iterate child boxes in [start, end).
bool next_box(Reader& r, uint64_t end, Box* box) {
  if (r.pos + 8 > end) return false;
  uint64_t start = r.pos;
  uint64_t size = r.u32();
  box->type = r.u32();
  if (size == 1) {
    size = r.u64();
  } else if (size == 0) {
    size = end - start;
  }
  if (!r.ok || size < 8 || start + size > end) return false;
  box->payload_start = r.pos;
  box->payload_end = start + size;
  return true;
}

struct SampleTables {
  std::vector<uint32_t> stsz;
  std::vector<uint64_t> stco;
  struct StscEntry {
    uint32_t first_chunk, samples_per_chunk;
  };
  std::vector<StscEntry> stsc;
  std::vector<std::pair<uint32_t, uint32_t>> stts;  // (count, delta)
  std::vector<std::pair<uint32_t, int64_t>> ctts;   // (count, offset)
  std::vector<uint32_t> stss;                       // 1-based sample numbers
};

}  // namespace

bool Mp4File::open(const std::string& path) {
  path_ = path;
  std::unique_ptr<FILE, int (*)(FILE*)> fp(fopen(path.c_str(), "rb"), fclose);
  if (!fp) return false;
  Reader r(fp.get());
  fseeko(fp.get(), 0, SEEK_END);
  uint64_t file_size = (uint64_t)ftello(fp.get());
  r.seek(0);

  // Find moov -> trak (video avc1) -> mdia -> minf -> stbl.
  SampleTables st;
  bool found_video = false;

  Box box;
  while (next_box(r, file_size, &box)) {
    if (box.type == fourcc("moov")) {
      uint64_t moov_end = box.payload_end;
      Box trak;
      while (next_box(r, moov_end, &trak)) {
        if (trak.type != fourcc("trak") || found_video) {
          if (trak.type == fourcc("mvhd")) { /* skip */
          }
          r.seek(trak.payload_end);
          continue;
        }
        // Walk this trak looking for an avc1 sample entry.
        SampleTables cur;
        Mp4Track track;
        bool is_avc = false;
        uint64_t trak_end = trak.payload_end;
        Box b1;
        while (next_box(r, trak_end, &b1)) {
          if (b1.type == fourcc("mdia")) {
            Box b2;
            while (next_box(r, b1.payload_end, &b2)) {
              if (b2.type == fourcc("mdhd")) {
                uint8_t version = r.u8();
                r.u8();
                r.u16();  // flags
                if (version == 1) {
                  r.u64();
                  r.u64();
                  track.timescale = r.u32();
                  track.duration = r.u64();
                } else {
                  r.u32();
                  r.u32();
                  track.timescale = r.u32();
                  track.duration = r.u32();
                }
              } else if (b2.type == fourcc("minf")) {
                Box b3;
                while (next_box(r, b2.payload_end, &b3)) {
                  if (b3.type == fourcc("stbl")) {
                    Box b4;
                    while (next_box(r, b3.payload_end, &b4)) {
                      uint32_t t = b4.type;
                      if (t == fourcc("stsd")) {
                        r.u32();  // version+flags
                        uint32_t n = r.u32();
                        Box entry;
                        for (uint32_t i = 0; i < n && next_box(r, b4.payload_end, &entry); i++) {
                          if (entry.type == fourcc("avc1") ||
                              entry.type == fourcc("avc3")) {
                            // VisualSampleEntry: 6 reserved + 2 data_ref
                            // + 16 predefined/reserved + w/h + ...
                            r.seek(entry.payload_start + 24);
                            track.width = r.u16();
                            track.height = r.u16();
                            r.seek(entry.payload_start + 78);
                            Box cfg;
                            while (next_box(r, entry.payload_end, &cfg)) {
                              if (cfg.type == fourcc("avcC")) {
                                r.u8();  // version
                                r.u8();  // profile
                                r.u8();  // compat
                                r.u8();  // level
                                track.nal_length_size = (r.u8() & 3) + 1;
                                int nsps = r.u8() & 31;
                                for (int s = 0; s < nsps; s++) {
                                  uint16_t len = r.u16();
                                  std::vector<uint8_t> nal(len);
                                  r.read(nal.data(), len);
                                  track.sps.push_back(std::move(nal));
                                }
                                int npps = r.u8();
                                for (int p = 0; p < npps; p++) {
                                  uint16_t len = r.u16();
                                  std::vector<uint8_t> nal(len);
                                  r.read(nal.data(), len);
                                  track.pps.push_back(std::move(nal));
                                }
                                is_avc = true;
                              }
                              r.seek(cfg.payload_end);
                            }
                          }
                          r.seek(entry.payload_end);
                        }
                      } else if (t == fourcc("stsz")) {
                        r.u32();
                        uint32_t uniform = r.u32();
                        uint32_t count = r.u32();
                        cur.stsz.resize(count);
                        if (uniform) {
                          for (auto& v : cur.stsz) v = uniform;
                        } else {
                          for (auto& v : cur.stsz) v = r.u32();
                        }
                      } else if (t == fourcc("stco")) {
                        r.u32();
                        uint32_t count = r.u32();
                        cur.stco.resize(count);
                        for (auto& v : cur.stco) v = r.u32();
                      } else if (t == fourcc("co64")) {
                        r.u32();
                        uint32_t count = r.u32();
                        cur.stco.resize(count);
                        for (auto& v : cur.stco) v = r.u64();
                      } else if (t == fourcc("stsc")) {
                        r.u32();
                        uint32_t count = r.u32();
                        cur.stsc.resize(count);
                        for (auto& e : cur.stsc) {
                          e.first_chunk = r.u32();
                          e.samples_per_chunk = r.u32();
                          r.u32();  // sample description index
                        }
                      } else if (t == fourcc("stts")) {
                        r.u32();
                        uint32_t count = r.u32();
                        cur.stts.resize(count);
                        for (auto& e : cur.stts) {
                          e.first = r.u32();
                          e.second = r.u32();
                        }
                      } else if (t == fourcc("ctts")) {
                        uint8_t version = r.u8();
                        r.u8();
                        r.u16();
                        uint32_t count = r.u32();
                        cur.ctts.resize(count);
                        for (auto& e : cur.ctts) {
                          e.first = r.u32();
                          uint32_t v = r.u32();
                          e.second = version == 0 ? (int64_t)v : (int64_t)(int32_t)v;
                          // version 0 stores unsigned, but negative
                          // offsets appear in practice as int32
                          if (version == 0 && v > 0x7fffffff)
                            e.second = (int64_t)(int32_t)v;
                        }
                      } else if (t == fourcc("stss")) {
                        r.u32();
                        uint32_t count = r.u32();
                        cur.stss.resize(count);
                        for (auto& v : cur.stss) v = r.u32();
                      }
                      r.seek(b4.payload_end);
                    }
                  }
                  r.seek(b3.payload_end);
                }
              }
              r.seek(b2.payload_end);
            }
          }
          r.seek(b1.payload_end);
        }
        if (is_avc && !cur.stsz.empty()) {
          st = std::move(cur);
          track_ = std::move(track);
          found_video = true;
        }
        r.seek(trak.payload_end);
      }
    }
    r.seek(box.payload_end);
    if (found_video) break;
  }

  if (!found_video) return false;

  // Flatten sample tables into per-sample records.
  size_t n = st.stsz.size();
  track_.samples.resize(n);

  // Offsets: walk chunks.
  {
    size_t sample = 0;
    size_t chunk_count = st.stco.size();
    for (size_t ci = 0; ci < chunk_count && sample < n; ci++) {
      // samples per chunk from stsc (entries have 1-based first_chunk).
      uint32_t spc = 1;
      for (const auto& e : st.stsc) {
        if (e.first_chunk <= ci + 1) spc = e.samples_per_chunk;
      }
      uint64_t off = st.stco[ci];
      for (uint32_t s = 0; s < spc && sample < n; s++) {
        track_.samples[sample].offset = off;
        track_.samples[sample].size = st.stsz[sample];
        off += st.stsz[sample];
        sample++;
      }
    }
  }

  // DTS from stts, PTS from ctts.
  {
    int64_t dts = 0;
    size_t sample = 0;
    for (const auto& [count, delta] : st.stts) {
      for (uint32_t i = 0; i < count && sample < n; i++) {
        track_.samples[sample].dts = dts;
        track_.samples[sample].pts = dts;
        dts += delta;
        sample++;
      }
    }
    sample = 0;
    for (const auto& [count, offset] : st.ctts) {
      for (uint32_t i = 0; i < count && sample < n; i++) {
        track_.samples[sample].pts = track_.samples[sample].dts + offset;
        sample++;
      }
    }
  }

  // Keyframes + GoP index.
  if (st.stss.empty()) {
    for (auto& s : track_.samples) s.keyframe = true;
  } else {
    for (uint32_t num : st.stss)
      if (num >= 1 && num <= n) track_.samples[num - 1].keyframe = true;
  }
  gops_.clear();
  for (uint32_t i = 0; i < n; i++) {
    if (track_.samples[i].keyframe || gops_.empty()) {
      gops_.push_back({i, 1});
    } else {
      gops_.back().num_samples++;
    }
  }
  return true;
}

bool Mp4File::read_sample(uint32_t index, std::vector<uint8_t>* out) const {
  if (index >= track_.samples.size()) return false;
  const Mp4Sample& s = track_.samples[index];
  std::unique_ptr<FILE, int (*)(FILE*)> fp(fopen(path_.c_str(), "rb"), fclose);
  if (!fp) return false;
  if (fseeko(fp.get(), (off_t)s.offset, SEEK_SET) != 0) return false;
  out->resize(s.size);
  return fread(out->data(), 1, s.size, fp.get()) == s.size;
}

}  // namespace cova
