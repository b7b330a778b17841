/* C shims for the reference encoder's yasm/nasm assembly symbols.
 *
 * Purpose: build the UPSTREAM SVT-VP9 reference encoder on a machine
 * without nasm/yasm, so the quality-parity harness (tools/bd_rate.py)
 * can produce reference bitstreams to compare against.  The reference
 * CMake hard-requires an ASM_NASM compiler (CMakeLists.txt:23); we feed
 * it a stub assembler (build_ref.sh) that emits empty objects and
 * resolve the resulting undefined symbols here by delegating to the
 * reference's own C fallbacks (vpx_dsp_rtcd.h _c kernels), so encoder
 * OUTPUT is bit-identical to a real C-only build.
 *
 * This file is harness tooling only - it is not part of the tpu_vp9
 * product and links only into the locally-built reference library.
 */
#include <stddef.h>
#include <stdint.h>

/* ---- intra predictors: delegate to the reference C kernels ---- */
#define PRED_PROTO(name) \
    void eb_vp9_##name##_c(uint8_t *dst, ptrdiff_t y_stride, \
                           const uint8_t *above, const uint8_t *left);
#define PRED_SHIM(name, isa) \
    void eb_vp9_##name##_##isa(uint8_t *dst, ptrdiff_t y_stride, \
                               const uint8_t *above, const uint8_t *left) { \
        eb_vp9_##name##_c(dst, y_stride, above, left); \
    }

#define PRED_ALL(type, isa4, isa8, isa16, isa32) \
    PRED_PROTO(type##_predictor_4x4) \
    PRED_PROTO(type##_predictor_8x8) \
    PRED_PROTO(type##_predictor_16x16) \
    PRED_PROTO(type##_predictor_32x32) \
    PRED_SHIM(type##_predictor_4x4, isa4) \
    PRED_SHIM(type##_predictor_8x8, isa8) \
    PRED_SHIM(type##_predictor_16x16, isa16) \
    PRED_SHIM(type##_predictor_32x32, isa32)

PRED_ALL(dc, sse2, sse2, sse2, sse2)
PRED_ALL(dc_128, sse2, sse2, sse2, sse2)
PRED_ALL(dc_left, sse2, sse2, sse2, sse2)
PRED_ALL(dc_top, sse2, sse2, sse2, sse2)
PRED_ALL(v, sse2, sse2, sse2, sse2)
PRED_ALL(h, sse2, sse2, sse2, sse2)
PRED_ALL(tm, sse2, sse2, sse2, sse2)
PRED_ALL(d45, sse2, sse2, ssse3, ssse3)
PRED_ALL(d63, ssse3, ssse3, ssse3, ssse3)
PRED_ALL(d153, ssse3, ssse3, ssse3, ssse3)
PRED_ALL(d207, sse2, ssse3, ssse3, ssse3)

/* ---- 2-tap bilinear subpel (vpx_subpixel_bilinear_ssse3.asm) ----
 * Semantics from the asm: taps filter[3], filter[4]; round +64, >>7,
 * clip to byte; _avg variants then average with dst via pavgb
 * ((a + b + 1) >> 1). */
static uint8_t clip_b(int v) { return v < 0 ? 0 : (v > 255 ? 255 : v); }

static void bilinear(const uint8_t *src, ptrdiff_t src_pitch,
                     uint8_t *dst, ptrdiff_t out_pitch,
                     uint32_t height, const int16_t *filter,
                     int width, ptrdiff_t step, int avg) {
    for (uint32_t r = 0; r < height; ++r) {
        for (int c = 0; c < width; ++c) {
            int v = src[c] * filter[3] + src[c + step] * filter[4];
            uint8_t p = clip_b((v + 64) >> 7);
            dst[c] = avg ? (uint8_t)((p + dst[c] + 1) >> 1) : p;
        }
        src += src_pitch;
        dst += out_pitch;
    }
}

#define BILINEAR_SHIM(w) \
    void eb_vp9_filter_block1d##w##_h2_ssse3( \
        const uint8_t *s, ptrdiff_t sp, uint8_t *d, ptrdiff_t dp, \
        uint32_t h, const int16_t *f) { bilinear(s, sp, d, dp, h, f, w, 1, 0); } \
    void eb_vp9_filter_block1d##w##_v2_ssse3( \
        const uint8_t *s, ptrdiff_t sp, uint8_t *d, ptrdiff_t dp, \
        uint32_t h, const int16_t *f) { bilinear(s, sp, d, dp, h, f, w, sp, 0); } \
    void eb_vp9_filter_block1d##w##_h2_avg_ssse3( \
        const uint8_t *s, ptrdiff_t sp, uint8_t *d, ptrdiff_t dp, \
        uint32_t h, const int16_t *f) { bilinear(s, sp, d, dp, h, f, w, 1, 1); } \
    void eb_vp9_filter_block1d##w##_v2_avg_ssse3( \
        const uint8_t *s, ptrdiff_t sp, uint8_t *d, ptrdiff_t dp, \
        uint32_t h, const int16_t *f) { bilinear(s, sp, d, dp, h, f, w, sp, 1); }

BILINEAR_SHIM(4)
BILINEAR_SHIM(8)
BILINEAR_SHIM(16)

/* ---- residual subtract (subtract_sse2.asm) ---- */
void eb_vp9_subtract_block_c(int rows, int cols, int16_t *diff,
                             ptrdiff_t diff_stride, const uint8_t *src,
                             ptrdiff_t src_stride, const uint8_t *pred,
                             ptrdiff_t pred_stride);
void eb_vp9_subtract_block_sse2(int rows, int cols, int16_t *diff,
                                ptrdiff_t diff_stride, const uint8_t *src,
                                ptrdiff_t src_stride, const uint8_t *pred,
                                ptrdiff_t pred_stride) {
    eb_vp9_subtract_block_c(rows, cols, diff, diff_stride, src, src_stride,
                            pred, pred_stride);
}

/* ---- plane copy (EbPictureOperators_SSE2.asm) ---- */
void eb_vp9_picture_copy_kernel(uint8_t *src, uint32_t src_stride,
                                uint8_t *dst, uint32_t dst_stride,
                                uint32_t area_width, uint32_t area_height,
                                uint32_t bytes_per_sample);
void eb_vp9_picture_copy_kernel_sse2(uint8_t *src, uint32_t src_stride,
                                     uint8_t *dst, uint32_t dst_stride,
                                     uint32_t area_width,
                                     uint32_t area_height) {
    eb_vp9_picture_copy_kernel(src, src_stride, dst, dst_stride, area_width,
                               area_height, 1);
}

/* ---- Log2f (EbPictureOperators_SSE2.asm:623 'bsr rax, r0') ---- */
uint32_t eb_vp9_Log2f_SSE2(uint32_t x) {
    return x ? 31u - (uint32_t)__builtin_clz(x) : 0u;
}
