/* tpu_vp9 public C API.
 *
 * TPU-native counterpart of the reference's library surface
 * (/root/reference/Source/API/EbSvtVp9Enc.h:365-439): the same
 * 7-step lifecycle (init handle -> set parameter -> init encoder ->
 * send picture / get packet -> deinit), re-expressed for this
 * framework.  The implementation (tpu_vp9_capi.c) embeds CPython and
 * drives tpu_vp9.api.Vp9Encoder, so FFmpeg/GStreamer plugins and any
 * C caller link one shared library with no Python in their source.
 */
#ifndef TPU_VP9_ENC_H
#define TPU_VP9_ENC_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define TPU_VP9_API __attribute__((visibility("default")))

typedef enum {
    TPU_VP9_OK = 0,
    TPU_VP9_ERROR_BAD_PARAM = 1,
    TPU_VP9_ERROR_INIT = 2,
    TPU_VP9_ERROR_INTERNAL = 3,
    TPU_VP9_NO_PACKET = 4,  /* get_packet: nothing available yet */
} TpuVp9Status;

typedef struct TpuVp9Encoder TpuVp9Encoder;  /* opaque handle */

typedef struct TpuVp9Config {
    uint32_t width;
    uint32_t height;
    uint32_t fps_num;
    uint32_t fps_den;
    uint32_t qp;              /* 0..63 (CQP) */
    uint32_t enc_mode;        /* M0..M9 */
    int32_t intra_period;     /* -1 = only first frame */
    uint32_t rate_control;    /* 0 CQP, 1 VBR, 2 CBR */
    uint32_t target_bitrate;  /* bits/s (VBR/CBR) */
    uint32_t vbv_buf_size;    /* bits; 0 = derived */
    uint32_t pred_structure;  /* 0 low-delay P, 2 random access */
    uint32_t tune;            /* 0 SQ, 1 OQ, 2 VMAF */
    uint32_t tile_columns;    /* log2; clamped to spec range */
} TpuVp9Config;

typedef struct TpuVp9Packet {
    const uint8_t *data;  /* valid until the next get_packet/free call */
    size_t size;
    int64_t pts;
    int64_t dts;
    int is_keyframe;
} TpuVp9Packet;

/* 1. create a handle (initializes the embedded interpreter on first use) */
TPU_VP9_API TpuVp9Status tpu_vp9_enc_init_handle(TpuVp9Encoder **enc);

/* 2. fill cfg with defaults, then 3. commit the configuration */
TPU_VP9_API void tpu_vp9_enc_default_config(TpuVp9Config *cfg);
TPU_VP9_API TpuVp9Status tpu_vp9_enc_set_parameter(TpuVp9Encoder *enc,
                                                   const TpuVp9Config *cfg);

/* 4. allocate internal resources (compiles/loads device paths) */
TPU_VP9_API TpuVp9Status tpu_vp9_enc_init(TpuVp9Encoder *enc);

/* 5. push one I420 picture (y/u/v planes with strides); NULL = EOS */
TPU_VP9_API TpuVp9Status tpu_vp9_enc_send_picture(
    TpuVp9Encoder *enc, const uint8_t *y, int y_stride, const uint8_t *u,
    int u_stride, const uint8_t *v, int v_stride, int64_t pts,
    int force_keyframe);

/* 6. pull the next packet; TPU_VP9_NO_PACKET when none pending.
 * The packet data lives until the next call on this handle. */
TPU_VP9_API TpuVp9Status tpu_vp9_enc_get_packet(TpuVp9Encoder *enc,
                                                TpuVp9Packet *pkt);

/* 7. destroy */
TPU_VP9_API TpuVp9Status tpu_vp9_enc_deinit(TpuVp9Encoder *enc);

#ifdef __cplusplus
}
#endif
#endif /* TPU_VP9_ENC_H */
