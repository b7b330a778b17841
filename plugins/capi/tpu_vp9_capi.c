/* C API implementation: embeds CPython and drives tpu_vp9.api.
 *
 * Counterpart of the reference's EbEncHandle.c public entry points
 * (eb_vp9_svt_init_handle .. eb_vp9_deinit_handle); here the encoder
 * engine is the Python/JAX framework, so the handle owns an embedded
 * interpreter (shared, refcounted across handles) and per-handle
 * Vp9Encoder/EncoderConfig objects.  GIL discipline: every call
 * acquires PyGILState; the interpreter is initialized lazily on the
 * first handle.
 */
#include "tpu_vp9_enc.h"

#include <Python.h>
#include <stdlib.h>
#include <string.h>

struct TpuVp9Encoder {
    PyObject *enc;       /* tpu_vp9.api.Vp9Encoder */
    PyObject *cfg;       /* tpu_vp9.config.EncoderConfig */
    PyObject *last_pkt;  /* holds the bytes alive for TpuVp9Packet */
    TpuVp9Config c;
};

static int g_py_owner = 0;  /* we called Py_Initialize ourselves */

static TpuVp9Status ensure_python(void) {
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
        g_py_owner = 1;
        /* release the GIL acquired by Py_Initialize so PyGILState
         * works from any caller thread */
        PyEval_SaveThread();
    }
    return TPU_VP9_OK;
}

TpuVp9Status tpu_vp9_enc_init_handle(TpuVp9Encoder **out) {
    if (!out) return TPU_VP9_ERROR_BAD_PARAM;
    if (ensure_python() != TPU_VP9_OK) return TPU_VP9_ERROR_INIT;
    PyGILState_STATE st = PyGILState_Ensure();
    TpuVp9Encoder *e = (TpuVp9Encoder *)calloc(1, sizeof(*e));
    TpuVp9Status rc = TPU_VP9_OK;
    PyObject *mod = PyImport_ImportModule("tpu_vp9.api");
    if (!mod) {
        PyErr_Print();
        free(e);
        rc = TPU_VP9_ERROR_INIT;
        goto done;
    }
    e->enc = PyObject_CallMethod(mod, "Vp9Encoder", NULL);
    Py_DECREF(mod);
    if (!e->enc) {
        PyErr_Print();
        free(e);
        rc = TPU_VP9_ERROR_INIT;
        goto done;
    }
    tpu_vp9_enc_default_config(&e->c);
    *out = e;
done:
    PyGILState_Release(st);
    return rc;
}

void tpu_vp9_enc_default_config(TpuVp9Config *cfg) {
    memset(cfg, 0, sizeof(*cfg));
    cfg->width = 0;
    cfg->height = 0;
    cfg->fps_num = 30;
    cfg->fps_den = 1;
    cfg->qp = 45;
    cfg->enc_mode = 9;
    cfg->intra_period = -2;  /* ~1 s keyframe interval (library default) */
    cfg->rate_control = 0;
    cfg->pred_structure = 2;
    cfg->tune = 1;
}

TpuVp9Status tpu_vp9_enc_set_parameter(TpuVp9Encoder *e,
                                       const TpuVp9Config *cfg) {
    if (!e || !cfg || !cfg->width || !cfg->height)
        return TPU_VP9_ERROR_BAD_PARAM;
    e->c = *cfg;
    PyGILState_STATE st = PyGILState_Ensure();
    TpuVp9Status rc = TPU_VP9_OK;
    PyObject *mod = PyImport_ImportModule("tpu_vp9.config");
    PyObject *kw = NULL, *args = NULL, *ctor = NULL, *obj = NULL;
    if (!mod) goto fail;
    ctor = PyObject_GetAttrString(mod, "EncoderConfig");
    if (!ctor) goto fail;
    kw = Py_BuildValue(
        "{s:i,s:i,s:i,s:i,s:i,s:i,s:i,s:i,s:i,s:i,s:i,s:i}",
        "source_width", (int)cfg->width,
        "source_height", (int)cfg->height,
        "frame_rate_numerator", (int)cfg->fps_num,
        "frame_rate_denominator", (int)cfg->fps_den,
        "qp", (int)cfg->qp,
        "enc_mode", (int)cfg->enc_mode,
        "intra_period", (int)cfg->intra_period,
        "rate_control_mode", (int)cfg->rate_control,
        "target_bit_rate", (int)cfg->target_bitrate,
        "vbv_buf_size", (int)cfg->vbv_buf_size,
        "pred_structure", (int)cfg->pred_structure,
        "tune", (int)cfg->tune);
    args = PyTuple_New(0);
    if (!kw || !args) goto fail;
    obj = PyObject_Call(ctor, args, kw);
    if (!obj) goto fail;
    Py_XDECREF(e->cfg);
    e->cfg = obj;
    obj = PyObject_CallMethod(e->enc, "set_parameter", "O", e->cfg);
    if (!obj) goto fail;
    Py_DECREF(obj);
    goto done;
fail:
    PyErr_Print();
    rc = TPU_VP9_ERROR_BAD_PARAM;
done:
    Py_XDECREF(mod);
    Py_XDECREF(ctor);
    Py_XDECREF(kw);
    Py_XDECREF(args);
    PyGILState_Release(st);
    return rc;
}

TpuVp9Status tpu_vp9_enc_init(TpuVp9Encoder *e) {
    if (!e) return TPU_VP9_ERROR_BAD_PARAM;
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(e->enc, "init", NULL);
    TpuVp9Status rc = TPU_VP9_OK;
    if (!r) {
        PyErr_Print();
        rc = TPU_VP9_ERROR_INIT;
    }
    Py_XDECREF(r);
    PyGILState_Release(st);
    return rc;
}

TpuVp9Status tpu_vp9_enc_send_picture(TpuVp9Encoder *e, const uint8_t *y,
                                      int y_stride, const uint8_t *u,
                                      int u_stride, const uint8_t *v,
                                      int v_stride, int64_t pts,
                                      int force_keyframe) {
    if (!e) return TPU_VP9_ERROR_BAD_PARAM;
    PyGILState_STATE st = PyGILState_Ensure();
    TpuVp9Status rc = TPU_VP9_OK;
    if (y == NULL) {  /* EOS */
        PyObject *r = PyObject_CallMethod(e->enc, "flush", NULL);
        if (!r) {
            PyErr_Print();
            rc = TPU_VP9_ERROR_INTERNAL;
        }
        Py_XDECREF(r);
        PyGILState_Release(st);
        return rc;
    }
    int w = (int)e->c.width, h = (int)e->c.height;
    int cw = (w + 1) / 2, ch = (h + 1) / 2;
    /* pack the strided planes into contiguous bytes for Frame420 */
    PyObject *helper = PyImport_ImportModule("tpu_vp9.utils.capi_bridge");
    if (!helper) {
        PyErr_Print();
        PyGILState_Release(st);
        return TPU_VP9_ERROR_INTERNAL;
    }
    PyObject *yb = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)w * h);
    PyObject *ub = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)cw * ch);
    PyObject *vb = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)cw * ch);
    if (yb && ub && vb) {
        char *d = PyBytes_AsString(yb);
        for (int r2 = 0; r2 < h; ++r2)
            memcpy(d + (size_t)r2 * w, y + (size_t)r2 * y_stride, (size_t)w);
        d = PyBytes_AsString(ub);
        for (int r2 = 0; r2 < ch; ++r2)
            memcpy(d + (size_t)r2 * cw, u + (size_t)r2 * u_stride,
                   (size_t)cw);
        d = PyBytes_AsString(vb);
        for (int r2 = 0; r2 < ch; ++r2)
            memcpy(d + (size_t)r2 * cw, v + (size_t)r2 * v_stride,
                   (size_t)cw);
        PyObject *r = PyObject_CallMethod(
            helper, "send_picture_bytes", "OOOOiii", e->enc, yb, ub, vb,
            w, h, force_keyframe);
        if (!r) {
            PyErr_Print();
            rc = TPU_VP9_ERROR_INTERNAL;
        }
        Py_XDECREF(r);
    } else {
        rc = TPU_VP9_ERROR_INTERNAL;
    }
    Py_XDECREF(yb);
    Py_XDECREF(ub);
    Py_XDECREF(vb);
    Py_DECREF(helper);
    PyGILState_Release(st);
    return rc;
}

TpuVp9Status tpu_vp9_enc_get_packet(TpuVp9Encoder *e, TpuVp9Packet *pkt) {
    if (!e || !pkt) return TPU_VP9_ERROR_BAD_PARAM;
    PyGILState_STATE st = PyGILState_Ensure();
    TpuVp9Status rc = TPU_VP9_OK;
    PyObject *helper = PyImport_ImportModule("tpu_vp9.utils.capi_bridge");
    PyObject *r = helper ? PyObject_CallMethod(helper, "get_packet_tuple",
                                               "O", e->enc)
                         : NULL;
    if (!r) {
        if (PyErr_Occurred()) PyErr_Print();
        rc = TPU_VP9_ERROR_INTERNAL;
    } else if (r == Py_None) {
        rc = TPU_VP9_NO_PACKET;
        Py_DECREF(r);
    } else {
        /* (bytes, pts, dts, is_key) */
        PyObject *data = PyTuple_GetItem(r, 0);
        pkt->data = (const uint8_t *)PyBytes_AsString(data);
        pkt->size = (size_t)PyBytes_Size(data);
        pkt->pts = PyLong_AsLongLong(PyTuple_GetItem(r, 1));
        pkt->dts = PyLong_AsLongLong(PyTuple_GetItem(r, 2));
        pkt->is_keyframe = (int)PyLong_AsLong(PyTuple_GetItem(r, 3));
        Py_XDECREF(e->last_pkt);
        e->last_pkt = r;  /* keeps pkt->data alive until next call */
    }
    Py_XDECREF(helper);
    PyGILState_Release(st);
    return rc;
}

TpuVp9Status tpu_vp9_enc_deinit(TpuVp9Encoder *e) {
    if (!e) return TPU_VP9_ERROR_BAD_PARAM;
    PyGILState_STATE st = PyGILState_Ensure();
    Py_XDECREF(e->last_pkt);
    Py_XDECREF(e->cfg);
    Py_XDECREF(e->enc);
    PyGILState_Release(st);
    free(e);
    return TPU_VP9_OK;
}
