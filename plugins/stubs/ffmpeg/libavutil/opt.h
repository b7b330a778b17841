#ifndef STUB_AVU_OPT_H
#define STUB_AVU_OPT_H
#include <stdint.h>
enum AVOptionType { AV_OPT_TYPE_INT = 1 };
#define AV_OPT_FLAG_ENCODING_PARAM 1
#define AV_OPT_FLAG_VIDEO_PARAM 2
typedef struct AVOption {
    const char *name;
    const char *help;
    int offset;
    enum AVOptionType type;
    union { int64_t i64; } default_val;
    double min, max;
    int flags;
} AVOption;
const char *av_default_item_name(void *ctx);
#endif
