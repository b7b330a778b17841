/* FFmpeg AVCodec encoder wrapper for tpu_vp9 (libtpu_vp9.so).
 *
 * Role parity with the reference's ffmpeg_plugin/0001-*.patch (which
 * wraps libSvtVp9Enc); this file wraps OUR C API instead.  Drop into
 * libavcodec/ and register per README.md — the in-image environment
 * has no ffmpeg source tree, so this compiles there, not here; the
 * C API itself is exercised by plugins/capi/capi_smoke in CI.
 */
#include "libavutil/avassert.h"
#include "libavutil/common.h"
#include "libavutil/opt.h"

#include "avcodec.h"
#include "codec_internal.h"
#include "encode.h"

#include <tpu_vp9_enc.h>

typedef struct TpuVp9EncContext {
    const AVClass *class;
    TpuVp9Encoder *enc;
    int enc_mode;
    int qp;
    int rc_mode;
    int pred_struct;
    int eos_sent;
} TpuVp9EncContext;

static av_cold int tpu_vp9_enc_init_ff(AVCodecContext *avctx)
{
    TpuVp9EncContext *s = avctx->priv_data;
    TpuVp9Config cfg;

    if (tpu_vp9_enc_init_handle(&s->enc) != TPU_VP9_OK)
        return AVERROR_EXTERNAL;
    tpu_vp9_enc_default_config(&cfg);
    cfg.width = avctx->width;
    cfg.height = avctx->height;
    cfg.fps_num = avctx->framerate.num ? avctx->framerate.num
                                       : avctx->time_base.den;
    cfg.fps_den = avctx->framerate.num ? avctx->framerate.den
                                       : avctx->time_base.num;
    cfg.enc_mode = s->enc_mode;
    cfg.qp = s->qp;
    cfg.rate_control = s->rc_mode;
    cfg.target_bitrate = avctx->bit_rate;
    cfg.pred_structure = s->pred_struct;
    cfg.intra_period = avctx->gop_size > 0 ? avctx->gop_size - 1 : -2;
    if (tpu_vp9_enc_set_parameter(s->enc, &cfg) != TPU_VP9_OK)
        return AVERROR(EINVAL);
    if (tpu_vp9_enc_init(s->enc) != TPU_VP9_OK)
        return AVERROR_EXTERNAL;
    return 0;
}

static int tpu_vp9_enc_encode_ff(AVCodecContext *avctx, AVPacket *pkt,
                                 const AVFrame *frame, int *got_packet)
{
    TpuVp9EncContext *s = avctx->priv_data;
    TpuVp9Packet out;
    int ret;

    if (frame) {
        ret = tpu_vp9_enc_send_picture(
            s->enc, frame->data[0], frame->linesize[0], frame->data[1],
            frame->linesize[1], frame->data[2], frame->linesize[2],
            frame->pts, (frame->pict_type == AV_PICTURE_TYPE_I));
        if (ret != TPU_VP9_OK)
            return AVERROR_EXTERNAL;
    } else if (!s->eos_sent) {
        tpu_vp9_enc_send_picture(s->enc, NULL, 0, NULL, 0, NULL, 0, 0, 0);
        s->eos_sent = 1;
    }

    ret = tpu_vp9_enc_get_packet(s->enc, &out);
    if (ret == TPU_VP9_NO_PACKET) {
        *got_packet = 0;
        return 0;
    }
    if (ret != TPU_VP9_OK)
        return AVERROR_EXTERNAL;
    if ((ret = ff_get_encode_buffer(avctx, pkt, out.size, 0)) < 0)
        return ret;
    memcpy(pkt->data, out.data, out.size);
    pkt->pts = out.pts;
    pkt->dts = out.dts;
    if (out.is_keyframe)
        pkt->flags |= AV_PKT_FLAG_KEY;
    *got_packet = 1;
    return 0;
}

static av_cold int tpu_vp9_enc_close_ff(AVCodecContext *avctx)
{
    TpuVp9EncContext *s = avctx->priv_data;
    if (s->enc)
        tpu_vp9_enc_deinit(s->enc);
    s->enc = NULL;
    return 0;
}

#define OFFSET(x) offsetof(TpuVp9EncContext, x)
#define VE AV_OPT_FLAG_VIDEO_PARAM | AV_OPT_FLAG_ENCODING_PARAM
static const AVOption options[] = {
    { "preset", "encoding preset M0..M9 (quality..speed)",
      OFFSET(enc_mode), AV_OPT_TYPE_INT, { .i64 = 9 }, 0, 9, VE },
    { "qp", "constant quantizer (rc=cqp)",
      OFFSET(qp), AV_OPT_TYPE_INT, { .i64 = 45 }, 0, 63, VE },
    { "rc", "rate control (0 cqp, 1 vbr, 2 cbr)",
      OFFSET(rc_mode), AV_OPT_TYPE_INT, { .i64 = 0 }, 0, 2, VE },
    { "pred", "prediction structure (0 low-delay, 2 random access)",
      OFFSET(pred_struct), AV_OPT_TYPE_INT, { .i64 = 2 }, 0, 2, VE },
    { NULL },
};

static const AVClass tpu_vp9enc_class = {
    .class_name = "tpu_vp9enc",
    .item_name  = av_default_item_name,
    .option     = options,
    .version    = LIBAVUTIL_VERSION_INT,
};

const FFCodec ff_tpu_vp9_encoder = {
    .p.name         = "tpu_vp9",
    CODEC_LONG_NAME("tpu_vp9 VP9 encoder (TPU-native)"),
    .p.type         = AVMEDIA_TYPE_VIDEO,
    .p.id           = AV_CODEC_ID_VP9,
    .p.capabilities = AV_CODEC_CAP_DELAY | AV_CODEC_CAP_OTHER_THREADS,
    .priv_data_size = sizeof(TpuVp9EncContext),
    .init           = tpu_vp9_enc_init_ff,
    FF_CODEC_ENCODE_CB(tpu_vp9_enc_encode_ff),
    .close          = tpu_vp9_enc_close_ff,
    .p.priv_class   = &tpu_vp9enc_class,
    .p.pix_fmts     = (const enum AVPixelFormat[]){ AV_PIX_FMT_YUV420P,
                                                    AV_PIX_FMT_NONE },
    .p.wrapper_name = "libtpu_vp9",
};
