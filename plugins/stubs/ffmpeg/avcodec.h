/* Minimal FFmpeg API stub for compile-smoking plugins/ffmpeg/ in an
 * image without an ffmpeg tree (the reference CI compiles its plugin
 * against a real checkout, .travis.yml "FFmpeg patch" stage; this stub
 * catches signature rot in OUR glue).  Only the declarations the
 * plugin uses. */
#ifndef STUB_AVCODEC_H
#define STUB_AVCODEC_H
#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <errno.h>

typedef struct AVRational { int num, den; } AVRational;
typedef struct AVClass {
    const char *class_name;
    const char *(*item_name)(void *);
    const void *option;
    int version;
} AVClass;

enum AVPictureType { AV_PICTURE_TYPE_NONE = 0, AV_PICTURE_TYPE_I = 1 };
enum AVPixelFormat { AV_PIX_FMT_NONE = -1, AV_PIX_FMT_YUV420P = 0 };
enum AVMediaType { AVMEDIA_TYPE_VIDEO = 0 };
enum AVCodecID { AV_CODEC_ID_VP9 = 167 };

#define AV_CODEC_CAP_DELAY (1 << 5)
#define AV_CODEC_CAP_OTHER_THREADS (1 << 15)
#define AV_PKT_FLAG_KEY 1

typedef struct AVFrame {
    uint8_t *data[8];
    int linesize[8];
    int64_t pts;
    enum AVPictureType pict_type;
} AVFrame;

typedef struct AVPacket {
    uint8_t *data;
    int size;
    int64_t pts, dts;
    int flags;
} AVPacket;

typedef struct AVCodecContext {
    void *priv_data;
    int width, height;
    AVRational framerate, time_base;
    int64_t bit_rate;
    int gop_size;
} AVCodecContext;

typedef struct AVCodec {
    const char *name;
    const char *long_name;
    enum AVMediaType type;
    enum AVCodecID id;
    int capabilities;
    const AVClass *priv_class;
    const enum AVPixelFormat *pix_fmts;
    const char *wrapper_name;
} AVCodec;
#endif
