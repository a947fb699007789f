#include <stddef.h>
typedef struct AVCodec AVCodec;
extern const AVCodec ff_h264_decoder;
static const AVCodec* const my_list[] = { &ff_h264_decoder, NULL };
const AVCodec *av_codec_iterate(void **opaque) {
  size_t i = (size_t)*opaque;
  const AVCodec *c = my_list[i];
  if (c) *opaque = (void*)(i + 1);
  return c;
}
const AVCodec *avcodec_find_decoder(int id) { return id == 27 ? &ff_h264_decoder : 0; }
const AVCodec *avcodec_find_decoder_by_name(const char *n) { return &ff_h264_decoder; }
const AVCodec *avcodec_find_encoder(int id) { return 0; }
const AVCodec *avcodec_find_encoder_by_name(const char *n) { return 0; }
