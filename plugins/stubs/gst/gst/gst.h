/* Minimal GStreamer/GLib API stub for compile-smoking
 * plugins/gstreamer/ without a gst tree (reference CI: .travis.yml
 * "GStreamer patch" stage).  Declarations limited to what the plugin
 * uses. */
#ifndef STUB_GST_H
#define STUB_GST_H
#include <stddef.h>
#include <stdint.h>

typedef int gboolean;
typedef unsigned int guint;
typedef unsigned long gsize;
typedef uint64_t guint64;
typedef char gchar;
typedef void *gpointer;
#define TRUE 1
#define FALSE 0
#define G_MAXUINT 0xffffffffu

typedef struct _GObject { int dummy; } GObject;
typedef struct _GValue { int dummy; } GValue;
typedef struct _GParamSpec { int dummy; } GParamSpec;
typedef struct _GObjectClass {
    void (*set_property)(GObject *, guint, const GValue *, GParamSpec *);
    void (*get_property)(GObject *, guint, GValue *, GParamSpec *);
} GObjectClass;
typedef gsize GType;

#define G_PARAM_READWRITE 3
guint g_value_get_uint(const GValue *v);
void g_value_set_uint(GValue *v, guint x);
GParamSpec *g_param_spec_uint(const char *name, const char *nick,
                              const char *blurb, guint min, guint max,
                              guint dflt, int flags);
void g_object_class_install_property(GObjectClass *k, guint id,
                                     GParamSpec *spec);
#define G_OBJECT_CLASS(k) ((GObjectClass *)(k))
#define G_OBJECT_WARN_INVALID_PROPERTY_ID(o, p, s) ((void)0)

/* -- type declaration/definition macros (structural stand-ins) -- */
#define G_DECLARE_FINAL_TYPE(TN, t_n, MOD, OBJ, ParentName)              \
    typedef struct _##TN TN;                                             \
    typedef struct { ParentName##Class parent_class; } TN##Class;        \
    GType t_n##_get_type(void);                                          \
    static inline TN *MOD##_##OBJ(gpointer p) { return (TN *)p; }

#define G_DEFINE_TYPE(TN, t_n, PARENT_T)                                 \
    static void t_n##_init(TN *self);                                    \
    static void t_n##_class_init(TN##Class *klass);                      \
    GType t_n##_get_type(void) {                                         \
        return (GType)(gsize)&t_n##_class_init + (gsize)&t_n##_init      \
               + (gsize)PARENT_T;                                        \
    }

/* -- Gst core -- */
typedef struct _GstBuffer { int dummy; } GstBuffer;
typedef struct _GstCaps { int dummy; } GstCaps;
typedef struct _GstPlugin { int dummy; } GstPlugin;
typedef struct _GstPadTemplate { int dummy; } GstPadTemplate;
typedef struct _GstElementClass { int dummy; } GstElementClass;
typedef enum { GST_FLOW_OK = 0, GST_FLOW_ERROR = -5 } GstFlowReturn;
typedef enum { GST_PAD_SRC = 1, GST_PAD_SINK = 2 } GstPadDirection;
typedef enum { GST_PAD_ALWAYS = 0 } GstPadPresence;
typedef enum { GST_MAP_READ = 1 } GstMapFlags;
typedef enum { GST_RANK_SECONDARY = 128 } GstRank;
#define GST_ELEMENT_CLASS(k) ((GstElementClass *)(k))
#define GST_VERSION_MAJOR 1
#define GST_VERSION_MINOR 22
#define G_TYPE_STRING ((GType)64)

GstBuffer *gst_buffer_new_allocate(void *alloc, gsize size, void *params);
gsize gst_buffer_fill(GstBuffer *b, gsize off, const void *src, gsize n);
void gst_buffer_unref(GstBuffer *b);
GstCaps *gst_caps_new_simple(const char *media, const char *field, ...);
GstCaps *gst_caps_from_string(const char *s);
GstPadTemplate *gst_pad_template_new(const char *name, GstPadDirection d,
                                     GstPadPresence p, GstCaps *caps);
void gst_element_class_set_static_metadata(GstElementClass *k,
                                           const char *a, const char *b,
                                           const char *c, const char *d);
void gst_element_class_add_pad_template(GstElementClass *k,
                                        GstPadTemplate *t);
gboolean gst_element_register(GstPlugin *p, const char *name, guint rank,
                              GType type);

typedef struct _GstDebugCategory { int dummy; } GstDebugCategory;
#define GST_DEBUG_CATEGORY_STATIC(var) \
    static GstDebugCategory *var = (GstDebugCategory *)0
#define GST_DEBUG_CATEGORY_INIT(var, name, color, desc) \
    ((void)(var))

#define GST_PLUGIN_DEFINE(maj, min, name, desc, init_fn, version,        \
                          license, pkg, origin)                          \
    gboolean gst_plugin_##name##_register(void);                         \
    gboolean gst_plugin_##name##_register(void) {                        \
        return init_fn((GstPlugin *)0);                                  \
    }
#endif
