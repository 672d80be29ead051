// Test-only AAC encode helper (tests/test_ffdec.py builds this with g++ at
// test time and drives it over ctypes).  Encodes mono/stereo float PCM to
// .aac (ADTS) or .m4a/.mp4 via the system ffmpeg ENCODER + MUXER — the
// decode side under test (native/audioio/ffdec.cc) then runs against an
// independently produced stream.  Links ffmpeg directly: this helper only
// ever runs on the test host, where the dev packages exist.
//
// Build: g++ -O2 -fPIC -shared aacenc.cc -o libaacenc.so \
//            -lavformat -lavcodec -lavutil

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
#include <libavutil/frame.h>
#include <libavutil/log.h>
#include <libavutil/mathematics.h>
#include <libavutil/opt.h>
}

#include <algorithm>
#include <cstring>
#include <vector>

extern "C" int aacenc_encode(const char* path, const float* pcm, long n,
                             int sample_rate, int channels) {
  av_log_set_level(AV_LOG_QUIET);
  AVFormatContext* octx = nullptr;
  if (avformat_alloc_output_context2(&octx, nullptr, nullptr, path) < 0 ||
      !octx)
    return -1;
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!codec) return -2;
  AVStream* st = avformat_new_stream(octx, nullptr);
  AVCodecContext* cctx = avcodec_alloc_context3(codec);
  if (!st || !cctx) return -3;
  cctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  cctx->sample_rate = sample_rate;
  av_channel_layout_default(&cctx->ch_layout, channels);
  cctx->bit_rate = 128000;
  cctx->time_base = {1, sample_rate};
  if (octx->oformat->flags & AVFMT_GLOBALHEADER)
    cctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(cctx, codec, nullptr) < 0) return -4;
  if (avcodec_parameters_from_context(st->codecpar, cctx) < 0) return -5;
  st->time_base = cctx->time_base;
  if (!(octx->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&octx->pb, path, AVIO_FLAG_WRITE) < 0)
    return -6;
  if (avformat_write_header(octx, nullptr) < 0) return -7;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* fr = av_frame_alloc();
  const int fsize = cctx->frame_size > 0 ? cctx->frame_size : 1024;
  int rc = 0;
  auto drain = [&](bool) {
    while (avcodec_receive_packet(cctx, pkt) == 0) {
      av_packet_rescale_ts(pkt, cctx->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(octx, pkt) < 0) rc = -8;
    }
  };
  for (long start = 0; start < n && rc == 0; start += fsize) {
    const int block = static_cast<int>(std::min<long>(fsize, n - start));
    fr->nb_samples = block;
    fr->format = AV_SAMPLE_FMT_FLTP;
    av_channel_layout_copy(&fr->ch_layout, &cctx->ch_layout);
    fr->sample_rate = sample_rate;
    if (av_frame_get_buffer(fr, 0) < 0) {
      rc = -9;
      break;
    }
    for (int c = 0; c < channels; ++c) {
      float* dst = reinterpret_cast<float*>(fr->data[c]);
      for (int i = 0; i < block; ++i)
        dst[i] = pcm[(start + i) * channels + c];  // de-interleave
    }
    fr->pts = start;
    if (avcodec_send_frame(cctx, fr) < 0) rc = -10;
    drain(false);
    av_frame_unref(fr);
  }
  if (rc == 0) {
    avcodec_send_frame(cctx, nullptr);  // flush
    drain(true);
    if (av_write_trailer(octx) < 0) rc = -11;
  }
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&cctx);
  if (!(octx->oformat->flags & AVFMT_NOFILE)) avio_closep(&octx->pb);
  avformat_free_context(octx);
  return rc;
}
