#ifndef STUB_ENCODE_H
#define STUB_ENCODE_H
#include "avcodec.h"
int ff_get_encode_buffer(AVCodecContext *avctx, AVPacket *pkt,
                         int64_t size, int flags);
#endif
