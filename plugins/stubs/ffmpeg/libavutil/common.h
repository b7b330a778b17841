#ifndef STUB_AVU_COMMON_H
#define STUB_AVU_COMMON_H
#include <errno.h>
#define av_cold
#define AVERROR(e) (-(e))
#define AVERROR_EXTERNAL (-542398533)
#define LIBAVUTIL_VERSION_INT 0x3A0764
#endif
