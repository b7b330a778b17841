#ifndef STUB_CODEC_INTERNAL_H
#define STUB_CODEC_INTERNAL_H
#include "avcodec.h"
typedef struct FFCodec {
    AVCodec p;
    int priv_data_size;
    int (*init)(AVCodecContext *);
    int cb_type;
    struct {
        int (*encode)(AVCodecContext *, AVPacket *, const AVFrame *,
                      int *);
    } cb;
    int (*close)(AVCodecContext *);
} FFCodec;
#define FF_CODEC_ENCODE_CB(f) .cb_type = 1, .cb = { .encode = (f) }
#define CODEC_LONG_NAME(s) .p.long_name = (s)
#endif
