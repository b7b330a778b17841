"""Knock-out profile: time the full M9 step with stages disabled via
monkeypatching, to get in-graph marginal costs (async-safe: each
timing loops 10 steps then fetches a scalar)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_vp9.bitstream import tables as T
from tpu_vp9.pipeline import tpu_encdec as E
from tpu_vp9.utils.yuv import synthetic_frames


def main():
    w, h = 1920, 1080
    if len(sys.argv) >= 3:
        w, h = int(sys.argv[1]), int(sys.argv[2])
    g = E.make_geom(w, h)
    frames = list(synthetic_frames(w, h, 2))
    qidx = 160
    dc_q = jnp.asarray(T.dc_quant(qidx), jnp.int32)
    ac_q = jnp.asarray(T.ac_quant(qidx), jnp.int32)
    lam = jnp.asarray(max(1, (T.ac_quant(qidx) ** 2) >> 6), jnp.int32)
    filters = T.subpel_filters(T.InterpFilter.EIGHTTAP)

    def up(f):
        return tuple(
            jnp.asarray(E.pad_plane(np.asarray(p), g.pad_h >> s,
                                    g.pad_w >> s))
            for p, s in ((f.y, 0), (f.u, 1), (f.v, 1)))

    src_y, src_u, src_v = up(frames[1])
    ry, ru, rv = up(frames[0])
    ref_y = jax.jit(lambda p: E.extend_borders_device(
        p, g.width, g.height))(ry)
    ref_u = jax.jit(lambda p: E.extend_borders_device(
        p, g.width >> 1, (g.height + 1) >> 1))(ru)
    ref_v = jax.jit(lambda p: E.extend_borders_device(
        p, g.width >> 1, (g.height + 1) >> 1))(rv)
    _ = np.asarray(ref_y[0, 0])

    from tpu_vp9.ops.loopfilter import sharpness_limits
    lim_t, mblim_t = sharpness_limits(0)
    lf = (jnp.asarray(32, jnp.int32),
          jnp.asarray(int(lim_t[32]), jnp.int32),
          jnp.asarray(int(mblim_t[32]), jnp.int32))
    rows, cols = g.rows32, g.cols32
    prev32 = jnp.zeros((rows * cols, 2), jnp.int32)
    prev16 = jnp.zeros((g.cols16 if g.strip else 1, 2), jnp.int32)

    orig = {
        "lf": E.loop_filter_device,
        "sp": E._subpel_exhaustive,
        "cd": E._candidate_decide,
        "mc": E.mc_predict_batch,
        "be": E.extend_borders_device,
        "fs": E._full_search_sse_mxu,
        "tr": E.transform_recon,
        "hs": E.hier_search,
    }

    def no_lf(y, u, v, geom, lvl, lim, mblim, split32=None):
        return y, u, v

    def no_sp(wins, src_blocks, dy, dx, n, filters, r=E.WIN_R):
        b = src_blocks.shape[0]
        return dy * 8, dx * 8, jnp.zeros((b,), jnp.int32)

    def no_hs(src_blocks, wins, n):
        b = src_blocks.shape[0]
        z = jnp.zeros((b,), jnp.int32)
        d = 2 * E.HALF_R + 1
        ln = n + 2 * E.REFINE_R + 8
        return (z, z, z, z, jnp.zeros((b, ln, ln), jnp.float32),
                jnp.zeros((b, d, d), jnp.int32), z)

    def no_cd(ssem, src2m, sse_zero, sse_new, new_r, new_c, prev_mv,
              rows, cols, r_map, q3s, scale, lam, left_edge=None,
              rates=None):
        return new_r, new_c, sse_new.astype(jnp.float32)

    def no_mc(ref_padded, pos_y, pos_x, mv_r, mv_c, n_out, ss, mi_rows,
              mi_cols, filters, x_base=0, y_off=None):
        b = pos_y.shape[0]
        return jnp.zeros((b, n_out, n_out), jnp.uint8)

    def no_be(plane, crop_w, crop_h, border=E.BORDER):
        return jnp.pad(plane, border)

    def no_fs(src_blocks, wins, n, r=E.WIN_R):
        b = src_blocks.shape[0]
        d = 2 * r + 1
        z = jnp.zeros((b,), jnp.int32)
        return z, z, jnp.zeros((b, d, d), jnp.int32)

    def no_tr(src_blocks, pred_blocks, dc_q, ac_q, n, want_scan=False,
              tx_type=None):
        b = src_blocks.shape[0]
        lv = jnp.zeros((b, n, n), jnp.int16)
        eob = jnp.zeros((b,), jnp.int32)
        rec = pred_blocks.astype(jnp.uint8)
        if want_scan:
            return lv, eob, rec, jnp.zeros((b, n * n), jnp.int16)
        return lv, eob, rec

    def no_mcw(wins, pos_y, pos_x, mv_r, mv_c, n_out, ss, mi_rows,
               mi_cols, filters, win_r, org_off_y=0, org_off_x=0):
        b = pos_y.shape[0]
        return jnp.zeros((b, n_out, n_out), jnp.uint8)

    cases = [
        ("baseline", {}),
        ("-loopfilter", {"lf": no_lf}),
        ("-subpel", {"sp": no_sp}),
        ("-cand_decide", {"cd": no_cd}),
        ("-mc", {"mc": no_mc, "mcw": no_mcw}),
        ("-borders", {"be": no_be}),
        ("-fullsearch", {"fs": no_fs}),
        ("-hiersearch", {"hs": no_hs}),
        ("-transform", {"tr": no_tr}),
    ]
    subs = {"lf": "loop_filter_device", "sp": "_subpel_exhaustive",
            "cd": "_candidate_decide", "mc": "mc_predict_batch",
            "be": "extend_borders_device", "fs": "_full_search_sse_mxu",
            "tr": "transform_recon", "hs": "hier_search",
            "mcw": "mc_predict_from_wins"}
    orig["mcw"] = E.mc_predict_from_wins
    repl = {"lf": no_lf, "sp": no_sp, "cd": no_cd, "mc": no_mc,
            "be": no_be, "fs": no_fs, "tr": no_tr, "hs": no_hs,
            "mcw": no_mcw}

    for name, mods in cases:
        for k in orig:
            setattr(E, subs[k], repl[k] if k in mods else orig[k])
        E.make_pframe_step.cache_clear()
        step = E.make_pframe_step(g, split16=False, golden=False,
                                  blob_recon=True)
        refs = (jnp.copy(ref_y), jnp.copy(ref_u), jnp.copy(ref_v))
        outs, refs = step(src_y, src_u, src_v, *refs, prev32, prev16,
                          dc_q, ac_q, lam, *lf)
        _ = np.asarray(outs["m32"]["rate"])
        t0 = time.perf_counter()
        for _i in range(10):
            outs, refs = step(src_y, src_u, src_v, *refs, prev32, prev16,
                              dc_q, ac_q, lam, *lf)
        _ = np.asarray(outs["m32"]["rate"])
        ms = (time.perf_counter() - t0) / 10 * 1000
        print(f"{name}: {ms:.1f} ms", flush=True)
    for k in orig:
        setattr(E, subs[k], orig[k])


if __name__ == "__main__":
    main()
