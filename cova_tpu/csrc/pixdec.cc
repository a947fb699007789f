#include "pixdec.h"

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/frame.h>
#include <libavutil/motion_vector.h>
#include <libavutil/log.h>
#include <libavutil/opt.h>
}

#include <cstdlib>
#include <cstring>

namespace cova {

PixelDecoder::PixelDecoder(const uint8_t* extradata, size_t extradata_size,
                           bool export_mvs) {
  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_H264);
  if (!codec) return;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return;
  if (extradata && extradata_size) {
    ctx->extradata = (uint8_t*)av_mallocz(extradata_size +
                                          AV_INPUT_BUFFER_PADDING_SIZE);
    memcpy(ctx->extradata, extradata, extradata_size);
    ctx->extradata_size = (int)extradata_size;
  }
  if (export_mvs) ctx->flags2 |= AV_CODEC_FLAG2_EXPORT_MVS;
  // Debug aid: COVA_PIXDEC_DEBUG=1 prints libavcodec's per-MB type map,
  // the localization oracle for entropy-decoder parity work.
  if (getenv("COVA_PIXDEC_DEBUG")) {
    ctx->debug |= 8 | 16;  // FF_DEBUG_MB_TYPE | FF_DEBUG_QP
    av_log_set_level(AV_LOG_DEBUG);
  }
  ctx->thread_count = 0;  // auto
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    return;
  }
  ctx_ = ctx;
  frame_ = av_frame_alloc();
  pkt_ = av_packet_alloc();
  ok_ = ctx_ && frame_ && pkt_;
}

PixelDecoder::~PixelDecoder() {
  if (pkt_) {
    AVPacket* p = (AVPacket*)pkt_;
    av_packet_free(&p);
  }
  if (frame_) {
    AVFrame* f = (AVFrame*)frame_;
    av_frame_free(&f);
  }
  if (ctx_) {
    AVCodecContext* c = (AVCodecContext*)ctx_;
    avcodec_free_context(&c);
  }
}

bool PixelDecoder::receive_all(std::vector<DecodedFrame>* out) {
  AVCodecContext* ctx = (AVCodecContext*)ctx_;
  AVFrame* frame = (AVFrame*)frame_;
  while (true) {
    int rc = avcodec_receive_frame(ctx, frame);
    if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return true;
    if (rc < 0) return false;
    DecodedFrame df;
    df.width = frame->width;
    df.height = frame->height;
    df.pts = frame->pts;
    int w = frame->width, h = frame->height;
    df.y.resize((size_t)w * h);
    df.u.resize((size_t)(w / 2) * (h / 2));
    df.v.resize((size_t)(w / 2) * (h / 2));
    for (int r = 0; r < h; r++)
      memcpy(&df.y[(size_t)r * w], frame->data[0] + (size_t)r * frame->linesize[0], w);
    for (int r = 0; r < h / 2; r++) {
      memcpy(&df.u[(size_t)r * (w / 2)],
             frame->data[1] + (size_t)r * frame->linesize[1], w / 2);
      memcpy(&df.v[(size_t)r * (w / 2)],
             frame->data[2] + (size_t)r * frame->linesize[2], w / 2);
    }
    AVFrameSideData* sd =
        av_frame_get_side_data(frame, AV_FRAME_DATA_MOTION_VECTORS);
    if (sd) {
      const AVMotionVector* mvs = (const AVMotionVector*)sd->data;
      size_t n = sd->size / sizeof(AVMotionVector);
      df.mvs.reserve(n * 7);
      for (size_t i = 0; i < n; i++) {
        const AVMotionVector& m = mvs[i];
        // Normalize motion to quarter-pel.
        int32_t mx = m.motion_scale ? m.motion_x * 4 / m.motion_scale : 0;
        int32_t my = m.motion_scale ? m.motion_y * 4 / m.motion_scale : 0;
        df.mvs.push_back(mx);
        df.mvs.push_back(my);
        df.mvs.push_back((int32_t)m.dst_x);
        df.mvs.push_back((int32_t)m.dst_y);
        df.mvs.push_back((int32_t)m.w);
        df.mvs.push_back((int32_t)m.h);
        df.mvs.push_back((int32_t)m.source);
      }
    }
    out->push_back(std::move(df));
    av_frame_unref(frame);
  }
}

bool PixelDecoder::send(const uint8_t* data, size_t size, int64_t pts,
                        std::vector<DecodedFrame>* out) {
  if (!ok_) return false;
  AVPacket* pkt = (AVPacket*)pkt_;
  av_new_packet(pkt, (int)size);
  memcpy(pkt->data, data, size);
  pkt->pts = pts;
  int rc = avcodec_send_packet((AVCodecContext*)ctx_, pkt);
  av_packet_unref(pkt);
  if (rc < 0 && rc != AVERROR(EAGAIN)) return false;
  return receive_all(out);
}

bool PixelDecoder::flush(std::vector<DecodedFrame>* out) {
  if (!ok_) return false;
  avcodec_send_packet((AVCodecContext*)ctx_, nullptr);
  bool r = receive_all(out);
  avcodec_flush_buffers((AVCodecContext*)ctx_);
  return r;
}

}  // namespace cova
