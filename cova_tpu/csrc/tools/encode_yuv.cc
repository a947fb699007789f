// Encode raw I420 frames with libx264 into the .rec interchange format
// (consumed by cova_tpu/utils/mp4loop.py::mux_rec_to_mp4) — the encode
// half of reencode.cc without the decode half, so first-party synthetic
// content (examples/make_synth.py: the cross-scene generalization
// corpus, VERDICT r4 next #3) can become a conforming H.264/MP4 input
// without any reference-derived pixels.
//
// Usage: encode_yuv IN.yuv OUT.rec WxH [x264opts] [crf]
//   IN.yuv: concatenated I420 frames (Y then U then V planes), or "-"
//   for stdin (lets the generator stream frames without a multi-GB
//   temp file). Timescale is fixed at 15360 (the demo clip's), 30 fps.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/frame.h>
#include <libavutil/opt.h>
}

static void write_u32(FILE* f, uint32_t v) { fwrite(&v, 4, 1, f); }
static void write_i64(FILE* f, int64_t v) { fwrite(&v, 8, 1, f); }

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s IN.yuv OUT.rec WxH [x264opts] [crf]\n",
            argv[0]);
    return 2;
  }
  const char* in_path = argv[1];
  const char* out_path = argv[2];
  int w = 0, h = 0;
  if (sscanf(argv[3], "%dx%d", &w, &h) != 2 || w <= 0 || h <= 0 ||
      (w | h) & 1) {
    fprintf(stderr, "bad geometry %s (want even WxH)\n", argv[3]);
    return 2;
  }
  const char* x264opts = argc > 4 ? argv[4] : "";
  const char* crf = argc > 5 ? argv[5] : "23";
  const uint32_t timescale = 15360;  // matches the demo clip
  const int64_t pts_step = timescale / 30;

  FILE* in = strcmp(in_path, "-") ? fopen(in_path, "rb") : stdin;
  if (!in) {
    fprintf(stderr, "cannot open %s\n", in_path);
    return 1;
  }

  const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) {
    fprintf(stderr, "libx264 not available\n");
    return 1;
  }
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = w;
  enc->height = h;
  enc->time_base = {1, (int)timescale};
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
  write_u32(out, (uint32_t)w);
  write_u32(out, (uint32_t)h);
  write_u32(out, timescale);
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

  const size_t ysz = (size_t)w * h, csz = ysz / 4;
  std::vector<uint8_t> buf(ysz + 2 * csz);
  int64_t n = 0;
  while (fread(buf.data(), 1, buf.size(), in) == buf.size()) {
    fr->format = AV_PIX_FMT_YUV420P;
    fr->width = w;
    fr->height = h;
    av_frame_get_buffer(fr, 0);
    av_frame_make_writable(fr);
    for (int r = 0; r < h; r++)
      memcpy(fr->data[0] + r * fr->linesize[0], buf.data() + (size_t)r * w,
             w);
    for (int r = 0; r < h / 2; r++) {
      memcpy(fr->data[1] + r * fr->linesize[1],
             buf.data() + ysz + (size_t)r * (w / 2), w / 2);
      memcpy(fr->data[2] + r * fr->linesize[2],
             buf.data() + ysz + csz + (size_t)r * (w / 2), w / 2);
    }
    fr->pts = n++ * pts_step;
    if (avcodec_send_frame(enc, fr) < 0) {
      fprintf(stderr, "send_frame failed\n");
      return 1;
    }
    av_frame_unref(fr);
    drain();
  }
  avcodec_send_frame(enc, nullptr);
  drain();
  if (in != stdin) fclose(in);
  fclose(out);
  fprintf(stderr, "encoded %lld frames -> %d packets\n", (long long)n,
          packets);
  return 0;
}
