"""Stage-level profile of the device P-frame step at a given resolution.

Times each stage of pframe_step in isolation (own jit, donated refs
excluded) plus the full step, on the real chip.  Usage:
    python tools/profile_step.py [width height] [--m9]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_vp9.bitstream import tables as T
from tpu_vp9.pipeline import tpu_encdec as E
from tpu_vp9.utils.yuv import synthetic_frames


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000.0, r


def main():
    w, h = 1920, 1080
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) >= 2:
        w, h = int(args[0]), int(args[1])
    g = E.make_geom(w, h)
    print(f"geom: {g}")
    frames = list(synthetic_frames(w, h, 2))
    filters = T.subpel_filters(T.InterpFilter.EIGHTTAP)
    qidx = 160
    dc_q = jnp.asarray(T.dc_quant(qidx), jnp.int32)
    ac_q = jnp.asarray(T.ac_quant(qidx), jnp.int32)
    lam = jnp.asarray(max(1, (T.ac_quant(qidx) ** 2) >> 6), jnp.int32)

    def up(f):
        y = jnp.asarray(E.pad_plane(np.asarray(f.y), g.pad_h, g.pad_w))
        u = jnp.asarray(E.pad_plane(np.asarray(f.u), g.pad_h // 2,
                                    g.pad_w // 2))
        v = jnp.asarray(E.pad_plane(np.asarray(f.v), g.pad_h // 2,
                                    g.pad_w // 2))
        return y, u, v

    src_y, src_u, src_v = up(frames[1])
    ry, ru, rv = up(frames[0])
    ref_y = jax.jit(lambda p: E.extend_borders_device(p, g.width,
                                                      g.height))(ry)
    ref_u = jax.jit(lambda p: E.extend_borders_device(
        p, (g.width + 1) >> 1, (g.height + 1) >> 1))(ru)
    ref_v = jax.jit(lambda p: E.extend_borders_device(
        p, (g.width + 1) >> 1, (g.height + 1) >> 1))(rv)
    jax.block_until_ready((src_y, ref_y))
    print("uploaded; profiling stages", flush=True)

    rows, cols = g.rows32, g.cols32
    b32 = rows * cols
    prev32 = jnp.zeros((b32, 2), jnp.int32)
    src_blocks = jax.jit(
        lambda p: E._extract_blocks(p, 0, rows, cols, 32))(src_y)

    # stage 1: window extraction
    f_win = jax.jit(lambda r: E._extract_search_windows(
        r, 32, rows, cols, 0, np.arange(cols, dtype=np.int64) * 32))
    ms, wins = timeit(f_win, ref_y)
    print(f"windows32: {ms:.2f} ms  shape={wins.shape}", flush=True)

    # stage 2: full search
    f_fs = jax.jit(lambda s, w_: E._full_search_sse_mxu(s, w_, 32))
    ms, (dy, dx) = timeit(f_fs, src_blocks, wins)
    print(f"full_search32: {ms:.2f} ms", flush=True)

    # stage 3: subpel
    f_sp = jax.jit(lambda w_, s, a, b: E._subpel_exhaustive(
        w_, s, a, b, 32, filters))
    ms, (mv_r, mv_c) = timeit(f_sp, wins, src_blocks, dy, dx)
    print(f"subpel32: {ms:.2f} ms", flush=True)

    # stage 4: candidate decide
    f_cd = jax.jit(lambda ry_, s, nr, nc, pm: E._candidate_decide(
        ry_, s, *E._zone_positions(g, 32)[:2], nr, nc, None, pm,
        rows, cols, 32, g, lam, filters, zone_origin=(0, 0)))
    ms, _ = timeit(f_cd, ref_y, src_blocks, mv_r, mv_c, prev32)
    print(f"cand_decide32: {ms:.2f} ms", flush=True)

    # stage 5: MC + transform_recon (via encode_zone minus search):
    pos_y, pos_x, _, _ = E._zone_positions(g, 32)

    def mc_tr(ry_, ru_, rv_, sy, su, sv, mr, mc_):
        pred_y = E.mc_predict_batch(ry_, pos_y, pos_x, mr, mc_, 32, 0,
                                    g.mi_rows, g.mi_cols, filters)
        pred_u = E.mc_predict_batch(ru_, pos_y // 2, pos_x // 2, mr, mc_,
                                    16, 1, g.mi_rows, g.mi_cols, filters)
        pred_v = E.mc_predict_batch(rv_, pos_y // 2, pos_x // 2, mr, mc_,
                                    16, 1, g.mi_rows, g.mi_cols, filters)
        sb = E._extract_blocks(sy, 0, rows, cols, 32)
        sub = E._extract_blocks(su, 0, rows, cols, 16)
        svb = E._extract_blocks(sv, 0, rows, cols, 16)
        o1 = E.transform_recon(sb, pred_y, dc_q, ac_q, 32, want_scan=True)
        o2 = E.transform_recon(sub, pred_u, dc_q, ac_q, 16, want_scan=True)
        o3 = E.transform_recon(svb, pred_v, dc_q, ac_q, 16, want_scan=True)
        return o1, o2, o3

    f_mt = jax.jit(mc_tr)
    ms, _ = timeit(f_mt, ref_y, ref_u, ref_v, src_y, src_u, src_v,
                   mv_r, mv_c)
    print(f"mc+transform_recon: {ms:.2f} ms", flush=True)

    # stage 6: loop filter
    lf_lvl = jnp.asarray(32, jnp.int32)
    from tpu_vp9.ops.loopfilter import sharpness_limits
    lim_t, mblim_t = sharpness_limits(0)
    lf_lim = jnp.asarray(int(lim_t[32]), jnp.int32)
    lf_mblim = jnp.asarray(int(mblim_t[32]), jnp.int32)
    f_lf = jax.jit(lambda y, u, v: E.loop_filter_device(
        y, u, v, g, lf_lvl, lf_lim, lf_mblim))
    ms, _ = timeit(f_lf, ry, ru, rv)
    print(f"loop_filter: {ms:.2f} ms", flush=True)

    # stage 7: border extend
    f_be = jax.jit(lambda y, u, v: (
        E.extend_borders_device(y, g.width, g.height),
        E.extend_borders_device(u, (g.width + 1) >> 1, (g.height + 1) >> 1),
        E.extend_borders_device(v, (g.width + 1) >> 1,
                                (g.height + 1) >> 1)))
    ms, _ = timeit(f_be, ry, ru, rv)
    print(f"border_extend x3: {ms:.2f} ms", flush=True)

    # full steps
    for split16, golden in ((False, False), (True, True)):
        if (split16 or golden) and g.strip:
            continue
        step = E.make_pframe_step(g, split16=split16, golden=golden,
                                  blob_recon=True)
        n16 = (rows * 2 * cols * 2) if split16 else (
            g.cols16 if g.strip else 1)
        prev16 = jnp.zeros((n16, 2), jnp.int32)
        extra = ()
        if golden:
            fc = T.default_frame_context()
            t = E.make_rate_tabs(fc, qidx)
            extra = (jnp.asarray(t["mode_cost"]),
                     jnp.asarray(t["joint_cost"]),
                     jnp.asarray(t["nmv_row"]), jnp.asarray(t["nmv_col"]),
                     jnp.asarray(t["ref_cost"]), jnp.asarray(t["lam_bits"]))
            gold = (jnp.copy(ref_y), jnp.copy(ref_u), jnp.copy(ref_v))

        def run():
            refs = (jnp.copy(ref_y), jnp.copy(ref_u), jnp.copy(ref_v))
            if golden:
                return step(src_y, src_u, src_v, *refs, *gold, prev32,
                            prev16, dc_q, ac_q, lam, lf_lvl, lf_lim,
                            lf_mblim, *extra)
            return step(src_y, src_u, src_v, *refs, prev32, prev16,
                        dc_q, ac_q, lam, lf_lvl, lf_lim, lf_mblim)

        ms, _ = timeit(run, iters=5)
        name = "M8(split16+golden)" if split16 else "M9(uniform32)"
        print(f"full step {name}: {ms:.2f} ms = {1000/ms:.1f} fps",
              flush=True)


if __name__ == "__main__":
    main()
