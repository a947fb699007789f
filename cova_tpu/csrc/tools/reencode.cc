// Re-encode an MP4's video track with libx264 under different encoder
// settings (GoP length, B-frames, CAVLC/CABAC, ...) — the offline
// stand-in for the reference's multi-dataset evaluation corpus
// (reference: parse/config.yaml multi-day datasets): one source clip
// becomes several bitstream-structurally-different datasets.
//
// Usage: reencode SRC.mp4 OUT.rec "x264opts" [crf] [max_frames] [WxH]
//
// The optional WxH argument rescales every decoded frame (libswscale
// bicubic) before encoding — used to build the 1080p evaluation stream
// from the 720p demo clip (BASELINE.md north star is stated @1080p).
//
// OUT.rec layout (little-endian), consumed by
// cova_tpu/utils/mp4loop.py::mux_rec_to_mp4 which writes the MP4:
//   u32 width, u32 height, u32 timescale, u32 extradata_len,
//   extradata (avcC is built Python-side from in-band SPS/PPS),
//   then per packet: u32 size, i64 pts, i64 dts, u8 keyframe,
//   payload (Annex-B).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/frame.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include "../mp4.h"
#include "../pixdec.h"

using namespace cova;

static void write_u32(FILE* f, uint32_t v) { fwrite(&v, 4, 1, f); }
static void write_i64(FILE* f, int64_t v) { fwrite(&v, 8, 1, f); }

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s SRC.mp4 OUT.rec x264opts [crf]\n", argv[0]);
    return 2;
  }
  const char* src_path = argv[1];
  const char* out_path = argv[2];
  const char* x264opts = argv[3];
  const char* crf = argc > 4 ? argv[4] : "23";
  long max_frames = argc > 5 ? atol(argv[5]) : -1;
  int out_w = 0, out_h = 0;
  if (argc > 6 && sscanf(argv[6], "%dx%d", &out_w, &out_h) != 2) {
    fprintf(stderr, "bad scale spec %s (want WxH)\n", argv[6]);
    return 2;
  }

  Mp4File src;
  if (!src.open(src_path)) {
    fprintf(stderr, "cannot open %s\n", src_path);
    return 1;
  }
  const Mp4Track& track = src.track();

  // Rebuild avcC extradata for the decoder.
  std::vector<uint8_t> ed;
  {
    const auto& sps = track.sps[0];
    ed.push_back(1);
    ed.push_back(sps.size() > 1 ? sps[1] : 0);
    ed.push_back(sps.size() > 2 ? sps[2] : 0);
    ed.push_back(sps.size() > 3 ? sps[3] : 0);
    ed.push_back(0xfc | (track.nal_length_size - 1));
    ed.push_back(0xe0 | (uint8_t)track.sps.size());
    for (const auto& s : track.sps) {
      ed.push_back((uint8_t)(s.size() >> 8));
      ed.push_back((uint8_t)s.size());
      ed.insert(ed.end(), s.begin(), s.end());
    }
    ed.push_back((uint8_t)track.pps.size());
    for (const auto& p : track.pps) {
      ed.push_back((uint8_t)(p.size() >> 8));
      ed.push_back((uint8_t)p.size());
      ed.insert(ed.end(), p.begin(), p.end());
    }
  }

  PixelDecoder dec(ed.data(), ed.size());
  if (!dec.ok()) {
    fprintf(stderr, "decoder init failed\n");
    return 1;
  }

  const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) {
    fprintf(stderr, "libx264 not available\n");
    return 1;
  }
  if (!out_w || !out_h) {
    out_w = track.width;
    out_h = track.height;
  }
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = out_w;
  enc->height = out_h;
  enc->time_base = {1, (int)track.timescale};
  enc->framerate = {30, 1};
  enc->pix_fmt = AV_PIX_FMT_YUV420P;
  av_opt_set(enc->priv_data, "crf", crf, 0);
  if (strlen(x264opts)) av_opt_set(enc->priv_data, "x264opts", x264opts, 0);
  if (avcodec_open2(enc, codec, nullptr) < 0) {
    fprintf(stderr, "encoder open failed\n");
    return 1;
  }

  FILE* out = fopen(out_path, "wb");
  if (!out) {
    fprintf(stderr, "cannot write %s\n", out_path);
    return 1;
  }
  write_u32(out, (uint32_t)out_w);
  write_u32(out, (uint32_t)out_h);
  write_u32(out, track.timescale);
  write_u32(out, 0);  // extradata: SPS/PPS stay in-band (Annex-B)

  AVFrame* fr = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  int packets = 0;

  auto drain = [&]() {
    while (avcodec_receive_packet(enc, pkt) == 0) {
      write_u32(out, (uint32_t)pkt->size);
      write_i64(out, pkt->pts);
      write_i64(out, pkt->dts);
      fputc((pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0, out);
      fwrite(pkt->data, 1, pkt->size, out);
      packets++;
      av_packet_unref(pkt);
    }
  };

  std::vector<uint8_t> au;
  std::vector<DecodedFrame> frames;
  SwsContext* sws = nullptr;
  auto encode_frames = [&]() {
    // Frames must reach the encoder in presentation order; libavcodec's
    // decoder already reorders B-frames for us.
    for (auto& df : frames) {
      fr->format = AV_PIX_FMT_YUV420P;
      fr->width = out_w;
      fr->height = out_h;
      av_frame_get_buffer(fr, 0);
      av_frame_make_writable(fr);
      int cw = df.width / 2, ch = df.height / 2;
      if (df.width != out_w || df.height != out_h) {
        if (!sws) {
          sws = sws_getContext(df.width, df.height, AV_PIX_FMT_YUV420P,
                               out_w, out_h, AV_PIX_FMT_YUV420P,
                               SWS_BICUBIC, nullptr, nullptr, nullptr);
          if (!sws) {
            fprintf(stderr, "sws_getContext failed\n");
            exit(1);
          }
        }
        const uint8_t* src_data[4] = {df.y.data(), df.u.data(), df.v.data(),
                                      nullptr};
        int src_stride[4] = {df.width, cw, cw, 0};
        sws_scale(sws, src_data, src_stride, 0, df.height, fr->data,
                  fr->linesize);
      } else {
        for (int r = 0; r < df.height; r++)
          memcpy(fr->data[0] + r * fr->linesize[0],
                 df.y.data() + r * df.width, df.width);
        for (int r = 0; r < ch; r++) {
          memcpy(fr->data[1] + r * fr->linesize[1], df.u.data() + r * cw, cw);
          memcpy(fr->data[2] + r * fr->linesize[2], df.v.data() + r * cw, cw);
        }
      }
      fr->pts = df.pts;
      if (avcodec_send_frame(enc, fr) < 0) {
        fprintf(stderr, "send_frame failed\n");
        exit(1);
      }
      av_frame_unref(fr);
      drain();
    }
    frames.clear();
  };

  size_t n = track.samples.size();
  if (max_frames > 0 && (size_t)max_frames < n) n = (size_t)max_frames;
  for (size_t i = 0; i < n; i++) {
    if (!src.read_sample((uint32_t)i, &au)) break;
    dec.send(au.data(), au.size(), track.samples[i].pts, &frames);
    encode_frames();
  }
  dec.flush(&frames);
  encode_frames();
  avcodec_send_frame(enc, nullptr);
  drain();
  if (sws) sws_freeContext(sws);
  fclose(out);
  fprintf(stderr, "re-encoded %d packets\n", packets);
  return 0;
}
