// Test-stream generator: encodes synthetic video with libx264 (via
// libavcodec) into Annex-B H.264, used to exercise the first-party
// entropy decoder path by path (I/P/B, 8x8dct, weightp, refs, ...).
//
// Usage: make_test_stream OUT.264 WIDTH HEIGHT NFRAMES "x264opts" [crf]
//
// Build: g++ -O2 -o make_test_stream make_test_stream.cc -lavcodec -lavutil

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/frame.h>
#include <libavutil/opt.h>
}

int main(int argc, char** argv) {
  if (argc < 6) {
    fprintf(stderr, "usage: %s OUT.264 W H N x264opts [crf]\n", argv[0]);
    return 2;
  }
  const char* out_path = argv[1];
  int w = atoi(argv[2]), h = atoi(argv[3]), n = atoi(argv[4]);
  const char* x264opts = argv[5];
  const char* crf = argc > 6 ? argv[6] : "23";

  const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) {
    fprintf(stderr, "libx264 not available\n");
    return 1;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  ctx->width = w;
  ctx->height = h;
  ctx->time_base = {1, 30};
  ctx->framerate = {30, 1};
  // COVA_TEST_CSP=422|444 selects the chroma sampling (default 4:2:0).
  const char* csp = getenv("COVA_TEST_CSP");
  ctx->pix_fmt = csp && !strcmp(csp, "422")   ? AV_PIX_FMT_YUV422P
                 : csp && !strcmp(csp, "444") ? AV_PIX_FMT_YUV444P
                 : csp && !strcmp(csp, "400") ? AV_PIX_FMT_GRAY8
                                              : AV_PIX_FMT_YUV420P;
  bool mono = ctx->pix_fmt == AV_PIX_FMT_GRAY8;
  int cw = mono ? 0 : ctx->pix_fmt == AV_PIX_FMT_YUV444P ? w : w / 2;
  int chh = mono ? 0 : ctx->pix_fmt == AV_PIX_FMT_YUV420P ? h / 2 : h;
  ctx->gop_size = 50;
  ctx->max_b_frames = 3;
  if (crf[0] == 'q') {  // qp_mode: pass "qN" for constant QP
    av_opt_set(ctx->priv_data, "qp", crf + 1, 0);
  } else {
    av_opt_set(ctx->priv_data, "crf", crf, 0);
  }
  if (strlen(x264opts)) av_opt_set(ctx->priv_data, "x264opts", x264opts, 0);
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    fprintf(stderr, "open failed\n");
    return 1;
  }

  FILE* out = fopen(out_path, "wb");
  AVFrame* frame = av_frame_alloc();
  frame->format = ctx->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto drain = [&]() {
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      // Length-prefixed records so consumers keep AU boundaries.
      uint32_t sz = (uint32_t)pkt->size;
      fwrite(&sz, 4, 1, out);
      fwrite(pkt->data, 1, pkt->size, out);
      av_packet_unref(pkt);
    }
  };

  for (int i = 0; i < n; i++) {
    av_frame_make_writable(frame);
    // Moving blobs + noise: exercises intra + inter + residual paths.
    // COVA_TEST_PATTERN=flat|grad|noise selects simpler content (FLAT).
    const char* pat = getenv("COVA_TEST_PATTERN");
    if (pat && !strcmp(pat, "flat")) {
      memset(frame->data[0], 128, (size_t)frame->linesize[0] * h);
      if (chh) memset(frame->data[1], 128, (size_t)frame->linesize[1] * chh);
      if (chh) memset(frame->data[2], 128, (size_t)frame->linesize[2] * chh);
      frame->pts = i;
      avcodec_send_frame(ctx, frame);
      drain();
      continue;
    }
    if (pat && (!strcmp(pat, "rand") || !strcmp(pat, "half"))) {
      // Full-range white noise: at very low QP the PCM escape becomes
      // cheaper than residual coding, so x264 emits I_PCM macroblocks.
      // "half" makes only the left half noisy — a mix of I_PCM and
      // regular macroblocks in the same slice.
      bool half = pat[0] == 'h';
      unsigned s = 12345 + i * 9973;
      auto rnd = [&]() { s = s * 1664525u + 1013904223u; return s >> 24; };
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          frame->data[0][y * frame->linesize[0] + x] =
              half && x >= w / 2 ? (uint8_t)(96 + ((x - y) & 31)) : (uint8_t)rnd();
      for (int y = 0; y < chh; y++)
        for (int x = 0; x < cw; x++) {
          frame->data[1][y * frame->linesize[1] + x] =
              half && x >= cw / 2 ? 120 : (uint8_t)rnd();
          frame->data[2][y * frame->linesize[2] + x] =
              half && x >= cw / 2 ? 130 : (uint8_t)rnd();
        }
      frame->pts = i;
      avcodec_send_frame(ctx, frame);
      drain();
      continue;
    }
    if (pat && !strcmp(pat, "fields")) {
      // Interlaced capture: even lines sample the moving scene at time
      // 2i, odd lines at 2i+1 — fast horizontal motion then combs every
      // other line, which makes x264's MBAFF mode decision prefer FIELD
      // coding for moving regions (and frame coding for the static
      // band), exercising mixed field/frame pairs.
      for (int y = 0; y < h; y++) {
        double t = 2 * i + (y & 1);
        for (int x = 0; x < w; x++) {
          int v;
          if (y < h / 4) {
            v = 60 + ((x >> 3) & 1) * 40 + ((y >> 3) & 1) * 20;  // static
          } else {
            int ph = (int)(x + 7 * t);
            v = 40 + ((ph >> 3) & 3) * 50 + ((y * 5) & 15);
          }
          frame->data[0][y * frame->linesize[0] + x] = (uint8_t)v;
        }
      }
      for (int y = 0; y < chh; y++)
        for (int x = 0; x < cw; x++) {
          frame->data[1][y * frame->linesize[1] + x] =
              (uint8_t)(118 + ((x + i) & 15));
          frame->data[2][y * frame->linesize[2] + x] = 130;
        }
      frame->pts = i;
      avcodec_send_frame(ctx, frame);
      drain();
      continue;
    }
    if (pat && !strcmp(pat, "grad")) {
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          frame->data[0][y * frame->linesize[0] + x] = (uint8_t)(x * 8 + y * 4 + i);
      if (chh) memset(frame->data[1], 128, (size_t)frame->linesize[1] * chh);
      if (chh) memset(frame->data[2], 128, (size_t)frame->linesize[2] * chh);
      frame->pts = i;
      avcodec_send_frame(ctx, frame);
      drain();
      continue;
    }
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        int v = 64 + 32 * sin(0.07 * x + 0.11 * i) + 24 * sin(0.05 * y) +
                ((x * 7919 + y * 104729 + i * 1299709) % 13);
        int bx = (50 + 6 * i) % (w > 64 ? w - 32 : 1);
        int by = (40 + 3 * i) % (h > 64 ? h - 32 : 1);
        if (x >= bx && x < bx + 32 && y >= by && y < by + 32) v = 200 + (x + y + i) % 20;
        frame->data[0][y * frame->linesize[0] + x] = (uint8_t)v;
      }
    for (int y = 0; y < chh; y++)
      for (int x = 0; x < cw; x++) {
        frame->data[1][y * frame->linesize[1] + x] =
            (uint8_t)(110 + 20 * sin(0.1 * x + 0.05 * i));
        frame->data[2][y * frame->linesize[2] + x] =
            (uint8_t)(130 + 20 * cos(0.08 * y + 0.04 * i));
      }
    frame->pts = i;
    avcodec_send_frame(ctx, frame);
    drain();
  }
  avcodec_send_frame(ctx, nullptr);
  drain();
  fclose(out);
  fprintf(stderr, "wrote %s\n", out_path);
  return 0;
}
