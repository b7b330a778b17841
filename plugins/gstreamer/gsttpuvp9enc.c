/* GStreamer video encoder element for tpu_vp9 (libtpu_vp9.so).
 *
 * Role parity with the reference's gstreamer-plugin/gstsvtvp9enc.c
 * (GstVideoEncoder subclass around the library handle); written
 * against OUR C API.  Build per README.md against a GStreamer dev
 * tree (not present in the CI image; the C API is exercised by
 * plugins/capi/capi_smoke there).
 */
#ifdef HAVE_CONFIG_H
#include "config.h"
#endif

#include <gst/gst.h>
#include <gst/video/gstvideoencoder.h>
#include <gst/video/video.h>
#include <string.h>

#include <tpu_vp9_enc.h>

GST_DEBUG_CATEGORY_STATIC(gst_tpuvp9enc_debug);
#define GST_CAT_DEFAULT gst_tpuvp9enc_debug

#define GST_TYPE_TPUVP9ENC (gst_tpuvp9enc_get_type())
G_DECLARE_FINAL_TYPE(GstTpuVp9Enc, gst_tpuvp9enc, GST, TPUVP9ENC,
                     GstVideoEncoder)

struct _GstTpuVp9Enc {
    GstVideoEncoder parent;
    TpuVp9Encoder *enc;
    GstVideoCodecState *state;
    guint preset;
    guint qp;
    guint rc_mode;
    guint target_bitrate;
};

G_DEFINE_TYPE(GstTpuVp9Enc, gst_tpuvp9enc, GST_TYPE_VIDEO_ENCODER)

enum { PROP_0, PROP_PRESET, PROP_QP, PROP_RC, PROP_BITRATE };

static gboolean gst_tpuvp9enc_start(GstVideoEncoder *encoder)
{
    GstTpuVp9Enc *self = GST_TPUVP9ENC(encoder);
    return tpu_vp9_enc_init_handle(&self->enc) == TPU_VP9_OK;
}

static gboolean gst_tpuvp9enc_stop(GstVideoEncoder *encoder)
{
    GstTpuVp9Enc *self = GST_TPUVP9ENC(encoder);
    if (self->enc)
        tpu_vp9_enc_deinit(self->enc);
    self->enc = NULL;
    if (self->state)
        gst_video_codec_state_unref(self->state);
    self->state = NULL;
    return TRUE;
}

static gboolean gst_tpuvp9enc_set_format(GstVideoEncoder *encoder,
                                         GstVideoCodecState *state)
{
    GstTpuVp9Enc *self = GST_TPUVP9ENC(encoder);
    GstVideoInfo *info = &state->info;
    TpuVp9Config cfg;
    GstCaps *caps;

    if (self->state)
        gst_video_codec_state_unref(self->state);
    self->state = gst_video_codec_state_ref(state);

    tpu_vp9_enc_default_config(&cfg);
    cfg.width = GST_VIDEO_INFO_WIDTH(info);
    cfg.height = GST_VIDEO_INFO_HEIGHT(info);
    cfg.fps_num = GST_VIDEO_INFO_FPS_N(info);
    cfg.fps_den = GST_VIDEO_INFO_FPS_D(info) ? GST_VIDEO_INFO_FPS_D(info)
                                             : 1;
    cfg.enc_mode = self->preset;
    cfg.qp = self->qp;
    cfg.rate_control = self->rc_mode;
    cfg.target_bitrate = self->target_bitrate;
    if (tpu_vp9_enc_set_parameter(self->enc, &cfg) != TPU_VP9_OK)
        return FALSE;
    if (tpu_vp9_enc_init(self->enc) != TPU_VP9_OK)
        return FALSE;

    caps = gst_caps_new_simple("video/x-vp9", "profile", G_TYPE_STRING,
                               "0", NULL);
    gst_video_encoder_set_output_state(encoder, caps, state);
    return TRUE;
}

static GstFlowReturn drain_packets(GstTpuVp9Enc *self)
{
    GstVideoEncoder *encoder = GST_VIDEO_ENCODER(self);
    TpuVp9Packet pkt;
    while (tpu_vp9_enc_get_packet(self->enc, &pkt) == TPU_VP9_OK) {
        GstVideoCodecFrame *frame =
            gst_video_encoder_get_oldest_frame(encoder);
        GstBuffer *buf = gst_buffer_new_allocate(NULL, pkt.size, NULL);
        gst_buffer_fill(buf, 0, pkt.data, pkt.size);
        if (frame) {
            frame->output_buffer = buf;
            if (pkt.is_keyframe)
                GST_VIDEO_CODEC_FRAME_SET_SYNC_POINT(frame);
            gst_video_encoder_finish_frame(encoder, frame);
        } else {
            gst_buffer_unref(buf);
        }
    }
    return GST_FLOW_OK;
}

static GstFlowReturn gst_tpuvp9enc_handle_frame(GstVideoEncoder *encoder,
                                                GstVideoCodecFrame *frame)
{
    GstTpuVp9Enc *self = GST_TPUVP9ENC(encoder);
    GstVideoFrame vframe;

    if (!gst_video_frame_map(&vframe, &self->state->info,
                             frame->input_buffer, GST_MAP_READ)) {
        gst_video_codec_frame_unref(frame);
        return GST_FLOW_ERROR;
    }
    tpu_vp9_enc_send_picture(
        self->enc, GST_VIDEO_FRAME_PLANE_DATA(&vframe, 0),
        GST_VIDEO_FRAME_PLANE_STRIDE(&vframe, 0),
        GST_VIDEO_FRAME_PLANE_DATA(&vframe, 1),
        GST_VIDEO_FRAME_PLANE_STRIDE(&vframe, 1),
        GST_VIDEO_FRAME_PLANE_DATA(&vframe, 2),
        GST_VIDEO_FRAME_PLANE_STRIDE(&vframe, 2), frame->pts,
        GST_VIDEO_CODEC_FRAME_IS_FORCE_KEYFRAME(frame));
    gst_video_frame_unmap(&vframe);
    gst_video_codec_frame_unref(frame);
    return drain_packets(self);
}

static GstFlowReturn gst_tpuvp9enc_finish(GstVideoEncoder *encoder)
{
    GstTpuVp9Enc *self = GST_TPUVP9ENC(encoder);
    tpu_vp9_enc_send_picture(self->enc, NULL, 0, NULL, 0, NULL, 0, 0, 0);
    return drain_packets(self);
}

static void gst_tpuvp9enc_set_property(GObject *object, guint prop_id,
                                       const GValue *value,
                                       GParamSpec *pspec)
{
    GstTpuVp9Enc *self = GST_TPUVP9ENC(object);
    switch (prop_id) {
    case PROP_PRESET: self->preset = g_value_get_uint(value); break;
    case PROP_QP: self->qp = g_value_get_uint(value); break;
    case PROP_RC: self->rc_mode = g_value_get_uint(value); break;
    case PROP_BITRATE: self->target_bitrate = g_value_get_uint(value); break;
    default: G_OBJECT_WARN_INVALID_PROPERTY_ID(object, prop_id, pspec);
    }
}

static void gst_tpuvp9enc_get_property(GObject *object, guint prop_id,
                                       GValue *value, GParamSpec *pspec)
{
    GstTpuVp9Enc *self = GST_TPUVP9ENC(object);
    switch (prop_id) {
    case PROP_PRESET: g_value_set_uint(value, self->preset); break;
    case PROP_QP: g_value_set_uint(value, self->qp); break;
    case PROP_RC: g_value_set_uint(value, self->rc_mode); break;
    case PROP_BITRATE: g_value_set_uint(value, self->target_bitrate); break;
    default: G_OBJECT_WARN_INVALID_PROPERTY_ID(object, prop_id, pspec);
    }
}

static void gst_tpuvp9enc_class_init(GstTpuVp9EncClass *klass)
{
    GObjectClass *gobject_class = G_OBJECT_CLASS(klass);
    GstElementClass *element_class = GST_ELEMENT_CLASS(klass);
    GstVideoEncoderClass *venc_class = GST_VIDEO_ENCODER_CLASS(klass);

    gobject_class->set_property = gst_tpuvp9enc_set_property;
    gobject_class->get_property = gst_tpuvp9enc_get_property;
    venc_class->start = gst_tpuvp9enc_start;
    venc_class->stop = gst_tpuvp9enc_stop;
    venc_class->set_format = gst_tpuvp9enc_set_format;
    venc_class->handle_frame = gst_tpuvp9enc_handle_frame;
    venc_class->finish = gst_tpuvp9enc_finish;

    g_object_class_install_property(
        gobject_class, PROP_PRESET,
        g_param_spec_uint("preset", "Preset", "M0..M9 quality..speed", 0, 9,
                          9, G_PARAM_READWRITE));
    g_object_class_install_property(
        gobject_class, PROP_QP,
        g_param_spec_uint("qp", "QP", "constant quantizer", 0, 63, 45,
                          G_PARAM_READWRITE));
    g_object_class_install_property(
        gobject_class, PROP_RC,
        g_param_spec_uint("rc", "RC", "0 cqp, 1 vbr, 2 cbr", 0, 2, 0,
                          G_PARAM_READWRITE));
    g_object_class_install_property(
        gobject_class, PROP_BITRATE,
        g_param_spec_uint("bitrate", "Bitrate", "bits/s", 0, G_MAXUINT, 0,
                          G_PARAM_READWRITE));

    gst_element_class_set_static_metadata(
        element_class, "tpu_vp9 VP9 encoder", "Codec/Encoder/Video",
        "VP9 encoding via the TPU-native tpu_vp9 framework",
        "tpu_vp9 authors");
    gst_element_class_add_pad_template(
        element_class,
        gst_pad_template_new(
            "sink", GST_PAD_SINK, GST_PAD_ALWAYS,
            gst_caps_from_string("video/x-raw,format=I420")));
    gst_element_class_add_pad_template(
        element_class,
        gst_pad_template_new("src", GST_PAD_SRC, GST_PAD_ALWAYS,
                             gst_caps_from_string("video/x-vp9")));
}

static void gst_tpuvp9enc_init(GstTpuVp9Enc *self)
{
    self->preset = 9;
    self->qp = 45;
}

static gboolean plugin_init(GstPlugin *plugin)
{
    GST_DEBUG_CATEGORY_INIT(gst_tpuvp9enc_debug, "tpuvp9enc", 0,
                            "tpu_vp9 encoder");
    return gst_element_register(plugin, "tpuvp9enc", GST_RANK_SECONDARY,
                                GST_TYPE_TPUVP9ENC);
}

#define PACKAGE "tpu_vp9"
GST_PLUGIN_DEFINE(GST_VERSION_MAJOR, GST_VERSION_MINOR, tpuvp9enc,
                  "tpu_vp9 VP9 encoder", plugin_init, "1.0", "LGPL",
                  "tpu_vp9", "https://localhost/")
