#ifndef STUB_AVASSERT_H
#define STUB_AVASSERT_H
#define av_assert0(x) ((void)(x))
#endif
