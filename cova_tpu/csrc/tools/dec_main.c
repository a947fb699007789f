// Minimal static-linked H.264 AU decoder for oracle tracing.
#include <libavcodec/avcodec.h>
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char** argv) {
  FILE* f = fopen(argv[1], "rb");
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  uint8_t* buf = malloc(n + 64);
  fread(buf, 1, n, f);
  const AVCodec* c = avcodec_find_decoder(AV_CODEC_ID_H264);
  AVCodecContext* ctx = avcodec_alloc_context3(c);
  ctx->thread_count = 1; ctx->debug = 1; av_log_set_level(48);
  avcodec_open2(ctx, c, NULL);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* fr = av_frame_alloc();
  // input: length-prefixed AUs
  long pos = 0; int fi = 0;
  while (pos + 4 <= n) {
    uint32_t sz = buf[pos] | buf[pos+1]<<8 | buf[pos+2]<<16 | (uint32_t)buf[pos+3]<<24;
    pos += 4;
    av_new_packet(pkt, sz);
    memcpy(pkt->data, buf + pos, sz);
    pos += sz;
    avcodec_send_packet(ctx, pkt);
    av_packet_unref(pkt);
    while (avcodec_receive_frame(ctx, fr) == 0) { fprintf(stderr, "FRAME %d\n", fi); }
    fi++;
    if (argc > 2 && fi >= atoi(argv[2])) break;
  }
  return 0;
}
