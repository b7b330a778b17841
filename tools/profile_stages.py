"""Per-stage timings with forced d2h sync (loop N + tiny fetch)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_vp9.bitstream import tables as T
from tpu_vp9.pipeline import tpu_encdec as E
from tpu_vp9.utils.yuv import synthetic_frames


def timeit(name, fn, *args, iters=10):
    r = fn(*args)
    s = jax.tree.leaves(r)[0]
    _ = np.asarray(s.reshape(-1)[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        r = fn(*args)
    _ = np.asarray(jax.tree.leaves(r)[0].reshape(-1)[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {ms:.2f} ms", flush=True)
    return r


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

    rows, cols = g.rows32, g.cols32
    prev32 = jnp.zeros((rows * cols, 2), jnp.int32)
    src_blocks = jax.jit(
        lambda p: E._extract_blocks(p, 0, rows, cols, 32))(src_y)

    f_win = jax.jit(lambda r: E._extract_search_windows(
        r, 32, rows, cols, 0, np.arange(cols, dtype=np.int64) * 32))
    wins = timeit("windows32", f_win, ref_y)

    f_fs = jax.jit(lambda s, w_: E._full_search_sse_mxu(s, w_, 32))
    dy, dx, ssem = timeit("full_search32", f_fs, src_blocks, wins)

    f_sp = jax.jit(lambda w_, s, a, b: E._subpel_exhaustive(
        w_, s, a, b, 32, filters))
    mv_r, mv_c, sse_new = timeit("subpel32", f_sp, wins, src_blocks,
                                 dy, dx)

    f_cd = jax.jit(lambda sm, s2, sn, mr, mc, pm: E._candidate_decide(
        sm, s2, sn, mr, mc, pm, rows, cols, E.WIN_R, lam))
    src2 = jax.jit(E._block_sq_sum)(src_blocks)
    _ = timeit("cand_decide32", f_cd, ssem, src2, sse_new, mv_r, mv_c,
               prev32)

    pos_y, pos_x, _, _ = E._zone_positions(g, 32)

    def mc3(ry_, ru_, rv_, mr, mc_):
        pred_y = E.mc_predict_batch(ry_, pos_y, pos_x, mr, mc_, 32, 0,
                                    g.mi_rows, g.mi_cols, filters)
        pred_u = E.mc_predict_batch(ru_, pos_y // 2, pos_x // 2, mr, mc_,
                                    16, 1, g.mi_rows, g.mi_cols, filters)
        pred_v = E.mc_predict_batch(rv_, pos_y // 2, pos_x // 2, mr, mc_,
                                    16, 1, g.mi_rows, g.mi_cols, filters)
        return pred_y, pred_u, pred_v
    f_mc = jax.jit(mc3)
    pred_y, pred_u, pred_v = timeit("mc3planes", f_mc, ref_y, ref_u,
                                    ref_v, mv_r, mv_c)

    def tr3(sy, su, sv, py, pu, pv):
        sb = E._extract_blocks(sy, 0, rows, cols, 32)
        sub = E._extract_blocks(su, 0, rows, cols, 16)
        svb = E._extract_blocks(sv, 0, rows, cols, 16)
        o1 = E.transform_recon(sb, py, dc_q, ac_q, 32, want_scan=True)
        o2 = E.transform_recon(sub, pu, dc_q, ac_q, 16, want_scan=True)
        o3 = E.transform_recon(svb, pv, dc_q, ac_q, 16, want_scan=True)
        return o1, o2, o3
    f_tr = jax.jit(tr3)
    _ = timeit("transform_recon3", f_tr, src_y, src_u, src_v,
               pred_y, pred_u, pred_v)

    from tpu_vp9.ops.loopfilter import sharpness_limits
    lim_t, mblim_t = sharpness_limits(0)
    lf_args = (jnp.asarray(32, jnp.int32),
               jnp.asarray(int(lim_t[32]), jnp.int32),
               jnp.asarray(int(mblim_t[32]), jnp.int32))
    f_lf = jax.jit(lambda y, u, v: E.loop_filter_device(
        y, u, v, g, *lf_args))
    _ = timeit("loop_filter", f_lf, ry, ru, rv)

    f_be = jax.jit(lambda y, u, v: (
        E.extend_borders_device(y, g.width, g.height),
        E.extend_borders_device(u, g.width >> 1, (g.height + 1) >> 1),
        E.extend_borders_device(v, g.width >> 1, (g.height + 1) >> 1)))
    _ = timeit("border_extend3", f_be, ry, ru, rv)

    if not g.strip:
        f_cw = jax.jit(lambda w_, a, b: E._extract_child_windows(
            w_, a, b, g))
        cw, by, bx = timeit("child_windows", f_cw, wins, dy, dx)
        cb16 = jax.jit(lambda p: E._extract_blocks(
            p, 0, rows * 2, cols * 2, 16))(src_y)
        f_fs16 = jax.jit(lambda s, w_: E._full_search_sse_mxu(
            s, w_, 16, r=E.CHILD_R))
        ddy, ddx, _ = timeit("child_search", f_fs16, cb16, cw)
        f_sp16 = jax.jit(lambda w_, s, a, b: E._subpel_exhaustive(
            w_, s, a, b, 16, filters, r=E.CHILD_R))
        _ = timeit("child_subpel", f_sp16, cw, cb16, ddy, ddx)


if __name__ == "__main__":
    main()
