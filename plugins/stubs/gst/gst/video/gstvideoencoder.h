#ifndef STUB_GST_VIDEOENCODER_H
#define STUB_GST_VIDEOENCODER_H
#include <gst/gst.h>
#include <gst/video/video.h>

typedef struct _GstVideoCodecState {
    GstVideoInfo info;
} GstVideoCodecState;
typedef struct _GstVideoCodecFrame {
    GstBuffer *input_buffer;
    GstBuffer *output_buffer;
    guint64 pts;
    guint flags;
} GstVideoCodecFrame;
#define GST_VIDEO_CODEC_FRAME_IS_FORCE_KEYFRAME(f) (((f)->flags & 1) != 0)
#define GST_VIDEO_CODEC_FRAME_SET_SYNC_POINT(f) ((f)->flags |= 2)

typedef struct _GstVideoEncoder { GObject parent; } GstVideoEncoder;
typedef struct _GstVideoEncoderClass {
    struct {
        GObjectClass parent_class;
    } parent_class_box;
    gboolean (*start)(GstVideoEncoder *);
    gboolean (*stop)(GstVideoEncoder *);
    gboolean (*set_format)(GstVideoEncoder *, GstVideoCodecState *);
    GstFlowReturn (*handle_frame)(GstVideoEncoder *,
                                  GstVideoCodecFrame *);
    GstFlowReturn (*finish)(GstVideoEncoder *);
} GstVideoEncoderClass;
typedef GstVideoEncoderClass GstVideoEncoderClassAlias;
#define GST_TYPE_VIDEO_ENCODER ((GType)128)
#define GST_VIDEO_ENCODER(o) ((GstVideoEncoder *)(o))
#define GST_VIDEO_ENCODER_CLASS(k) ((GstVideoEncoderClass *)(k))

GstVideoCodecState *gst_video_codec_state_ref(GstVideoCodecState *s);
void gst_video_codec_state_unref(GstVideoCodecState *s);
void gst_video_codec_frame_unref(GstVideoCodecFrame *f);
GstVideoCodecFrame *gst_video_encoder_get_oldest_frame(
    GstVideoEncoder *enc);
GstFlowReturn gst_video_encoder_finish_frame(GstVideoEncoder *enc,
                                             GstVideoCodecFrame *f);
GstVideoCodecState *gst_video_encoder_set_output_state(
    GstVideoEncoder *enc, GstCaps *caps, GstVideoCodecState *ref);
#endif
