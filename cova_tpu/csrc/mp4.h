// Minimal ISO-BMFF (MP4) demuxer for AVC video tracks.
// Replaces the reference's qtdemux + h264parse + gopsplit chain
// (reference: gst-plugins/gst-gopsplit/gstgopsplit.cpp) with a streaming
// sample-table index: samples are located once from the moov box and read
// on demand, and GoPs are indexed from the sync-sample table instead of
// buffering the whole stream until EOS like the reference's gopsplit.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace cova {

struct Mp4Sample {
  uint64_t offset = 0;   // absolute file offset
  uint32_t size = 0;     // bytes
  int64_t dts = 0;       // in timescale units
  int64_t pts = 0;       // dts + ctts offset
  bool keyframe = false;  // sync sample (IDR)
};

struct Mp4Track {
  uint32_t timescale = 0;
  uint64_t duration = 0;
  int width = 0, height = 0;
  int nal_length_size = 4;
  std::vector<std::vector<uint8_t>> sps;  // raw NAL payloads (incl. header)
  std::vector<std::vector<uint8_t>> pps;
  std::vector<Mp4Sample> samples;  // decode order
};

// GoP: a run of samples starting at a sync sample.
struct Gop {
  uint32_t first_sample = 0;  // index into track.samples
  uint32_t num_samples = 0;
};

class Mp4File {
 public:
  // Parses the moov box; returns false on malformed input or no AVC track.
  bool open(const std::string& path);
  const Mp4Track& track() const { return track_; }
  const std::vector<Gop>& gops() const { return gops_; }

  // Read one sample's bytes (length-prefixed NALs, as stored).
  bool read_sample(uint32_t index, std::vector<uint8_t>* out) const;

 private:
  std::string path_;
  Mp4Track track_;
  std::vector<Gop> gops_;
};

}  // namespace cova
