#ifndef STUB_GST_VIDEO_H
#define STUB_GST_VIDEO_H
#include <gst/gst.h>
typedef struct _GstVideoInfo {
    int width, height, fps_n, fps_d;
} GstVideoInfo;
#define GST_VIDEO_INFO_WIDTH(i) ((i)->width)
#define GST_VIDEO_INFO_HEIGHT(i) ((i)->height)
#define GST_VIDEO_INFO_FPS_N(i) ((i)->fps_n)
#define GST_VIDEO_INFO_FPS_D(i) ((i)->fps_d)
typedef struct _GstVideoFrame {
    void *data[4];
    int stride[4];
} GstVideoFrame;
#define GST_VIDEO_FRAME_PLANE_DATA(f, p) ((f)->data[p])
#define GST_VIDEO_FRAME_PLANE_STRIDE(f, p) ((f)->stride[p])
gboolean gst_video_frame_map(GstVideoFrame *f, const GstVideoInfo *info,
                             GstBuffer *buf, GstMapFlags flags);
void gst_video_frame_unmap(GstVideoFrame *f);
#endif
