"""Tile-column sharding of the device P-frame encode step.

This is the TPU-native counterpart of the reference's EncDec segment
grid (``EbEncDecSegments.c:1-132``): one frame's 32x32-block grid is
split into column shards laid out over the ``tile`` axis of a device
mesh, and a ``frame`` axis carries independent streams (the multi-
channel / GOP-parallel dimension).  The heavy stages (ME window search,
subpel refinement, MC, transform/recon) run shard-locally; reference
planes are sharded by columns and each shard receives a BORDER-wide
halo of its neighbours' columns via ``lax.ppermute`` (ring exchange
over ICI), which is exactly the pixel set the single-chip step can
reach (search centres are clamped to +-(BORDER - r - 8)).  RC
statistics (distortion/rate) are ``psum``-reduced over the mesh, the
role of the reference's rate-control feedback ports
(``EbEncHandle.c:315-318``).

Levels/MVs/eobs are bit-identical to the single-chip ``encode_zone``
for any shard count (asserted by ``tests/test_multichip_encdec.py``):
positions and UMV clamps stay in global coordinates, only the
dynamic-slice base moves per shard (``x_base``).

The loop filter crosses tile columns (VP9 applies it frame-wide after
all tiles), so the filtered-reference production stays a full-frame
pass: recon columns are all-gathered, filtered, and re-sharded.
"""

from __future__ import annotations

import numpy as np

from tpu_vp9.bitstream import tables as T
from tpu_vp9.pipeline.tpu_encdec import (
    BORDER, CHROMA_WIN_R, WIN_R, Geom, _block_sq_sum, _candidate_decide,
    _extract_search_windows, _full_search_sse_mxu, _scatter_blocks,
    _subpel_exhaustive, extend_borders_device, loop_filter_device,
    mc_predict_batch, mc_predict_from_wins, transform_recon,
)


def _shard_positions(geom: Geom, n_tiles: int, tile_idx, n: int = 32,
                     rows: int = None, y_base: int = 0):
    """Global (pos_y, pos_x) of one column shard's n-blocks."""
    import jax.numpy as jnp

    g = geom
    if rows is None:
        rows = g.rows32
    n_cols = (g.cols32 if n == 32 else g.cols16)
    cols_loc = n_cols // n_tiles
    ys = (y_base + np.arange(rows)[:, None] * n
          + np.zeros((1, cols_loc), np.int32)).reshape(-1)
    xs_loc = (np.zeros((rows, 1), np.int32)
              + np.arange(cols_loc)[None, :] * n).reshape(-1)
    x0 = tile_idx * (cols_loc * n)
    return (jnp.asarray(ys, jnp.int32),
            x0 + jnp.asarray(xs_loc, jnp.int32), rows, cols_loc, x0)


def _halo_exchange(ref_loc, axis_name: str, halo: int, n_shards: int):
    """Attach `halo` neighbour columns on each side of a column shard.

    Wide shards (local width >= halo): ring ppermute with both
    neighbours — the ICI-optimal exchange.  Narrow shards (toy meshes):
    all_gather + windowed take.  Frame edges replicate the boundary
    column either way (libvpx extend_frame semantics, so the result
    matches the global border-extended plane exactly)."""
    import jax.numpy as jnp
    from jax import lax

    n = n_shards
    idx = lax.axis_index(axis_name)
    wl = ref_loc.shape[1]
    if n == 1:
        return jnp.pad(ref_loc, ((0, 0), (halo, halo)), mode="edge")
    if wl >= halo:
        right_edge = ref_loc[:, -halo:]
        left_edge = ref_loc[:, :halo]
        from_left = lax.ppermute(right_edge, axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
        from_right = lax.ppermute(left_edge, axis_name,
                                  [(i + 1, i) for i in range(n - 1)])
        self_left = jnp.repeat(ref_loc[:, :1], halo, axis=1)
        self_right = jnp.repeat(ref_loc[:, -1:], halo, axis=1)
        left = jnp.where(idx == 0, self_left, from_left)
        right = jnp.where(idx == n - 1, self_right, from_right)
        return jnp.concatenate([left, ref_loc, right], axis=1)
    full = lax.all_gather(ref_loc, axis_name, axis=1, tiled=True)
    cols = jnp.clip(jnp.arange(-halo, wl + halo) + idx * wl, 0,
                    full.shape[1] - 1)
    return jnp.take(full, cols, axis=1)


def _encode_zone_shard(src_y, src_u, src_v, ref_y_h, ref_u_h, ref_v_h,
                       prev_mv, geom: Geom, n_tiles: int, tile_idx,
                       x_base_y, x_base_c, dc_q, ac_q, lam, filters,
                       n: int = 32, zone_rows: int = None, y_base: int = 0,
                       gold_h=None, rates=None):
    """Shard-local encode_zone against halo-extended refs.

    n/zone_rows/y_base select the zone (the uniform 32 grid or the
    16-strip bottom row of 720p/4K geometries).  ref_*_h: halo-extended
    local ref planes; x_base_y/x_base_c make mc_predict_batch's
    global-coordinate slices land on local columns (x_base =
    global_start - (BORDER - halo)).  Identical math to
    tpu_encdec.encode_zone with x_base threaded through."""
    import jax
    import jax.numpy as jnp

    g = geom
    pos_y, pos_x, rows, cols_loc, _ = _shard_positions(
        g, n_tiles, tile_idx, n=n, rows=zone_rows, y_base=y_base)
    src_blocks = src_y[y_base : y_base + rows * n] \
        .reshape(rows, n, cols_loc, n).transpose(0, 2, 1, 3) \
        .reshape(-1, n, n)

    # hierarchical (2x pyramid + refine) / exhaustive search from
    # static halo-local windows; the halo (= BORDER >= WIN_R + 4) makes
    # shard windows bit-identical to the single-chip border-extended
    # windows, so MVs are shard-count invariant
    wins = _extract_search_windows(
        ref_y_h, n, rows, cols_loc, y_base,
        np.arange(cols_loc, dtype=np.int64) * n)
    src2 = _block_sq_sum(src_blocks)
    from tpu_vp9.pipeline.tpu_encdec import (
        HALF_R, REFINE_R, _zero_sse, hier_search,
    )

    # exact ZERO SSE from the co-located halo-local region
    sse_zero = _zero_sse(ref_y_h, src_blocks, y_base, 0, rows, cols_loc,
                         n)
    if n == 32:
        c_y, c_x, dyr, dxr, loc, ssem, src2m = hier_search(
            src_blocks, wins, n)
        dy, dx = c_y + dyr, c_x + dxr
        sub_r, sub_c, sse_new = _subpel_exhaustive(
            loc, src_blocks, dyr, dxr, n, filters, r=REFINE_R)
        mv_r = c_y * 8 + sub_r
        mv_c = c_x * 8 + sub_c
        q3s, scale, r_map = 4, 4, HALF_R
    else:
        dy, dx, ssem = _full_search_sse_mxu(src_blocks, wins, n)
        mv_r, mv_c, sse_new = _subpel_exhaustive(wins, src_blocks, dy,
                                                 dx, n, filters)
        q3s, scale, src2m, r_map = 3, 1, src2, WIN_R
    # candidate decision needs the previous shard's boundary-column NEW
    # MVs (single small ppermute; frame edge gets zeros, matching the
    # unsharded zero-pad)
    from jax import lax

    new2 = jnp.stack([mv_r, mv_c], axis=-1).reshape(rows, cols_loc, 2)
    if n_tiles > 1:
        edge = lax.ppermute(new2[:, -1], "tile",
                            [(i, i + 1) for i in range(n_tiles - 1)])
        edge = jnp.where(tile_idx == 0, jnp.zeros_like(edge), edge)
    else:
        edge = jnp.zeros_like(new2[:, -1])
    mv_r, mv_c, cost_last = _candidate_decide(
        ssem, src2m, sse_zero, sse_new, mv_r, mv_c, prev_mv, rows,
        cols_loc, r_map, q3s, scale, lam, left_edge=edge, rates=rates)

    # GOLDEN anchor: identical candidate math to encode_zone's golden
    # block (ZERO exact on the halo-local anchor + prev-MV full-pel
    # score), so mesh streams keep the full M8 toolset byte-identically
    b_loc = rows * cols_loc
    ref_sel = jnp.zeros((b_loc,), jnp.int8)
    if gold_h is not None:
        from tpu_vp9.pipeline.tpu_encdec import (
            CAND_RATE_PROXY, _fullpel_sse,
        )

        zero = jnp.zeros_like(mv_r)
        g_cands_r = jnp.stack([zero, prev_mv[:, 0]])
        g_cands_c = jnp.stack([zero, prev_mv[:, 1]])
        g_sse0 = _zero_sse(gold_h[0], src_blocks, y_base, 0, rows,
                           cols_loc, n)
        g_sse1 = _fullpel_sse(gold_h[0], src_blocks, pos_y, pos_x,
                              prev_mv[:, 0], prev_mv[:, 1], n,
                              x_base=x_base_y)
        g_sses = jnp.stack([g_sse0, g_sse1])
        if rates is not None:
            mc_ = rates["mode_cost"]
            g_rate = jnp.stack([mc_[2], mc_[0]])[:, None]
            lam_f = rates["lam_bits"]
            g_costs = (g_sses.astype(jnp.float32)
                       + lam_f * g_rate.astype(jnp.float32) / 256.0)
            ref_extra = rates["ref_cost"].astype(jnp.float32) \
                * lam_f / 256.0
        else:
            rz, _, _, rp, _ = CAND_RATE_PROXY
            lam_f = lam.astype(jnp.float32)
            g_costs = (g_sses.astype(jnp.float32)
                       + lam_f * jnp.array([[rz], [rp]], jnp.float32))
            ref_extra = jnp.array([0.0, 2.0, 2.0], jnp.float32) * lam_f
        g_best = jnp.argmin(g_costs, axis=0)
        g_bidx = (g_best, jnp.arange(b_loc))
        g_cost = g_costs[g_bidx] + ref_extra[1]
        use_gold = g_cost < (cost_last + ref_extra[0])
        ref_sel = use_gold.astype(jnp.int8)
        mv_r = jnp.where(use_gold, g_cands_r[g_bidx], mv_r)
        mv_c = jnp.where(use_gold, g_cands_c[g_bidx], mv_c)

    # window-based MC (bit-identical to the full-plane gather; the
    # shard windows equal the single-chip windows, so MVs and
    # predictions stay shard-count invariant).  Chroma halo is
    # BORDER//2 wide, so local chroma col origins shift by
    # (halo_c - BORDER) relative to the BORDER frame the extractor
    # assumes.
    nc = n // 2
    pos_yc, pos_xc = pos_y // 2, pos_x // 2
    halo_shift_c = BORDER // 2 - BORDER
    col_px_c = (np.arange(cols_loc, dtype=np.int64) * nc + halo_shift_c)
    wu = _extract_search_windows(ref_u_h, nc, rows, cols_loc,
                                 y_base // 2, col_px_c, r=CHROMA_WIN_R)
    wv = _extract_search_windows(ref_v_h, nc, rows, cols_loc,
                                 y_base // 2, col_px_c, r=CHROMA_WIN_R)
    wy_mc = wins
    if gold_h is not None:
        gwy = _extract_search_windows(
            gold_h[0], n, rows, cols_loc, y_base,
            np.arange(cols_loc, dtype=np.int64) * n)
        gwu = _extract_search_windows(gold_h[1], nc, rows, cols_loc,
                                      y_base // 2, col_px_c,
                                      r=CHROMA_WIN_R)
        gwv = _extract_search_windows(gold_h[2], nc, rows, cols_loc,
                                      y_base // 2, col_px_c,
                                      r=CHROMA_WIN_R)
        msel = (ref_sel == 1)[:, None, None]
        wy_mc = jnp.where(msel, gwy, wy_mc)
        wu = jnp.where(msel, gwu, wu)
        wv = jnp.where(msel, gwv, wv)
    pred_y = mc_predict_from_wins(wy_mc, pos_y, pos_x, mv_r, mv_c, n, 0,
                                  g.mi_rows, g.mi_cols, filters, WIN_R)
    pred_u = mc_predict_from_wins(wu, pos_yc, pos_xc, mv_r, mv_c, nc, 1,
                                  g.mi_rows, g.mi_cols, filters,
                                  CHROMA_WIN_R)
    pred_v = mc_predict_from_wins(wv, pos_yc, pos_xc, mv_r, mv_c, nc, 1,
                                  g.mi_rows, g.mi_cols, filters,
                                  CHROMA_WIN_R)
    lv_y, eob_y, rec_y = transform_recon(src_blocks, pred_y, dc_q, ac_q, n)
    y0c = y_base // 2
    src_ub = src_u[y0c : y0c + rows * nc] \
        .reshape(rows, nc, cols_loc, nc).transpose(0, 2, 1, 3) \
        .reshape(-1, nc, nc)
    src_vb = src_v[y0c : y0c + rows * nc] \
        .reshape(rows, nc, cols_loc, nc).transpose(0, 2, 1, 3) \
        .reshape(-1, nc, nc)
    lv_u, eob_u, rec_u = transform_recon(src_ub, pred_u, dc_q, ac_q, nc)
    lv_v, eob_v, rec_v = transform_recon(src_vb, pred_v, dc_q, ac_q, nc)
    skip = (eob_y == 0) & (eob_u == 0) & (eob_v == 0)
    dist = ((rec_y.astype(jnp.int32) - src_blocks.astype(jnp.int32)) ** 2
            ).sum()
    rate = (lv_y != 0).sum() + (lv_u != 0).sum() + (lv_v != 0).sum()
    return {
        "mv": jnp.stack([mv_r, mv_c], axis=-1).astype(jnp.int16),
        "ref": ref_sel,
        "skip": skip,
        "eob_y": eob_y, "eob_u": eob_u, "eob_v": eob_v,
        "lv_y": lv_y, "lv_u": lv_u, "lv_v": lv_v,
        "rec_y": _scatter_blocks(rec_y, rows, cols_loc, n),
        "rec_u": _scatter_blocks(rec_u, rows, cols_loc, nc),
        "rec_v": _scatter_blocks(rec_v, rows, cols_loc, nc),
        "dist": dist, "rate": rate,
    }


def make_pframe_step_sharded(geom: Geom, mesh, n_tiles: int,
                             golden: bool = False):
    """Jitted multi-chip P-frame step over mesh axes ('frame', 'tile').

    Input/output layout (leading axis = frames, sharded over 'frame'):
      src planes   (F, pad_h, pad_w) sharded P('frame', None, 'tile')
      ref planes   (F, pad_h, pad_w) sharded the same (no borders; the
                   halo ring-exchange happens inside)
      prev_mv      (F, n_blocks32, 2) sharded P('frame', 'tile')
    Returns (outs, new refs) where outs' per-block arrays are sharded
    P('frame', 'tile') in raster order *within each shard* (strip
    geometries add m16_* arrays for the bottom 16-strip).
    new refs are the loop-filtered recon planes (not border-extended:
    the halo exchange re-derives borders each step).

    Requires geom.cols32 % n_tiles == 0 (and cols16 % n_tiles == 0 for
    strip geometries — implied by the 32-grid constraint).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if geom.cols32 % n_tiles:
        raise ValueError("cols32 must divide n_tiles")
    if geom.pad_w != geom.width:
        raise ValueError("sharded step requires width % 64 == 0")
    g = geom
    filters = T.subpel_filters(T.InterpFilter.EIGHTTAP)

    def one_frame(src_y, src_u, src_v, ref_y, ref_u, ref_v, prev_mv,
                  prev_mv16, dc_q, ac_q, lam, lf_lvl, lf_lim, lf_mblim,
                  gold_y=None, gold_u=None, gold_v=None, rates_in=None):
        from jax import lax

        rates = None
        if rates_in is not None:
            rates = {"mode_cost": rates_in[0], "joint_cost": rates_in[1],
                     "nmv_row": rates_in[2], "nmv_col": rates_in[3],
                     "ref_cost": rates_in[4], "lam_bits": rates_in[5],
                     "mv_cost_max": 1023}
        tile_idx = lax.axis_index("tile")
        x0 = tile_idx * (g.pad_w // n_tiles)
        # halo exchange of the reachable-pixel region over the tile
        # ring (ICI); chroma displacements are half the luma clamp
        halo_y, halo_c = BORDER, BORDER // 2
        ry = _halo_exchange(ref_y, "tile", halo_y, n_tiles)
        ru = _halo_exchange(ref_u, "tile", halo_c, n_tiles)
        rv = _halo_exchange(ref_v, "tile", halo_c, n_tiles)
        ry = jnp.pad(ry, ((BORDER, BORDER), (0, 0)), mode="edge")
        ru = jnp.pad(ru, ((BORDER, BORDER), (0, 0)), mode="edge")
        rv = jnp.pad(rv, ((BORDER, BORDER), (0, 0)), mode="edge")
        x_base_y = x0 + (BORDER - halo_y)
        x_base_c = x0 // 2 + (BORDER - halo_c)
        gold_h = None
        if golden:
            gy = _halo_exchange(gold_y, "tile", halo_y, n_tiles)
            gu = _halo_exchange(gold_u, "tile", halo_c, n_tiles)
            gv = _halo_exchange(gold_v, "tile", halo_c, n_tiles)
            gold_h = (jnp.pad(gy, ((BORDER, BORDER), (0, 0)), mode="edge"),
                      jnp.pad(gu, ((BORDER, BORDER), (0, 0)), mode="edge"),
                      jnp.pad(gv, ((BORDER, BORDER), (0, 0)), mode="edge"))
        out = _encode_zone_shard(src_y, src_u, src_v, ry, ru, rv,
                                 prev_mv, g, n_tiles, tile_idx,
                                 x_base_y, x_base_c,
                                 dc_q, ac_q, lam, filters,
                                 gold_h=gold_h, rates=rates)
        dist = out.pop("dist")
        rate = out.pop("rate")
        if g.strip:
            out16 = _encode_zone_shard(
                src_y, src_u, src_v, ry, ru, rv, prev_mv16, g, n_tiles,
                tile_idx, x_base_y, x_base_c, dc_q, ac_q, lam, filters,
                n=16, zone_rows=1, y_base=g.strip_y,
                gold_h=gold_h, rates=rates)
            dist = dist + out16.pop("dist")
            rate = rate + out16.pop("rate")
            for k in ("mv", "ref", "skip", "eob_y", "eob_u", "eob_v",
                      "lv_y", "lv_u", "lv_v"):
                out[f"m16_{k}"] = out16[k]
            out["rec_y"] = jnp.concatenate(
                [out["rec_y"], out16["rec_y"]], axis=0)
            out["rec_u"] = jnp.concatenate(
                [out["rec_u"], out16["rec_u"]], axis=0)
            out["rec_v"] = jnp.concatenate(
                [out["rec_v"], out16["rec_v"]], axis=0)
        # per-frame RC stats ride the mesh collectives (the reference's
        # rate_control_tasks fan-in, EbEncHandle.c:315-318)
        dist = lax.psum(dist, "tile")
        rate = lax.psum(rate, "tile")
        # full-frame loop filter on gathered recon (LF crosses tiles)
        rec_y = lax.all_gather(out["rec_y"], "tile", axis=1, tiled=True)
        rec_u = lax.all_gather(out["rec_u"], "tile", axis=1, tiled=True)
        rec_v = lax.all_gather(out["rec_v"], "tile", axis=1, tiled=True)
        if g.pad_w > g.width:
            extra = g.pad_w - g.width
            rec_y = jnp.pad(rec_y, ((0, 0), (0, extra)), mode="edge")
            rec_u = jnp.pad(rec_u, ((0, 0), (0, extra // 2)), mode="edge")
            rec_v = jnp.pad(rec_v, ((0, 0), (0, extra // 2)), mode="edge")
        if g.pad_h > rec_y.shape[0]:
            rec_y = jnp.pad(rec_y, ((0, g.pad_h - rec_y.shape[0]), (0, 0)),
                            mode="edge")
            rec_u = jnp.pad(rec_u,
                            ((0, g.pad_h // 2 - rec_u.shape[0]), (0, 0)),
                            mode="edge")
            rec_v = jnp.pad(rec_v,
                            ((0, g.pad_h // 2 - rec_v.shape[0]), (0, 0)),
                            mode="edge")
        rec_y, rec_u, rec_v = loop_filter_device(rec_y, rec_u, rec_v, g,
                                                 lf_lvl, lf_lim, lf_mblim)
        # re-shard the filtered reference: this shard's columns
        wl = g.pad_w // n_tiles
        new_ry = lax.dynamic_slice_in_dim(rec_y, tile_idx * wl, wl, axis=1)
        new_ru = lax.dynamic_slice_in_dim(rec_u, tile_idx * (wl // 2),
                                          wl // 2, axis=1)
        new_rv = lax.dynamic_slice_in_dim(rec_v, tile_idx * (wl // 2),
                                          wl // 2, axis=1)
        out["dist"] = dist
        out["rate"] = rate
        return out, (new_ry, new_ru, new_rv)

    def step(src_y, src_u, src_v, ref_y, ref_u, ref_v, prev_mv,
             prev_mv16, dc_q, ac_q, lam, lf_lvl, lf_lim, lf_mblim,
             *gold_and_rates):
        # the frame mesh axis shards the leading dim; each frame shard
        # loops its local frames with lax.map
        def body(sy, su, sv, ry, ru, rv, pm, pm16, *rest):
            scal = rest[:6]
            if golden:
                gy, gu, gv = rest[6:9]
                rates_v = rest[9:15]
            else:
                rates_v = None

            def per_frame(args):
                if golden:
                    return one_frame(*args[:8], *scal,
                                     gold_y=args[8], gold_u=args[9],
                                     gold_v=args[10], rates_in=rates_v)
                return one_frame(*args, *scal, rates_in=None)

            frames_in = (sy, su, sv, ry, ru, rv, pm, pm16)
            if golden:
                frames_in = frames_in + (gy, gu, gv)
            return jax.lax.map(per_frame, frames_in)

        shp = P("frame", None, "tile")
        shc = P("frame", None, "tile")
        shb = P("frame", "tile")
        rep = P()
        out_block = {k: shb for k in
                     ("mv", "ref", "skip", "eob_y", "eob_u", "eob_v",
                      "lv_y", "lv_u", "lv_v")}
        if g.strip:
            for k in list(out_block):
                out_block[f"m16_{k}"] = shb
        out_block["rec_y"] = shp
        out_block["rec_u"] = shc
        out_block["rec_v"] = shc
        out_block["dist"] = P("frame")
        out_block["rate"] = P("frame")
        n_scal = 6 + (6 if golden else 0)
        in_specs = (shp, shc, shc, shp, shc, shc, shb, shb,
                    rep, rep, rep, rep, rep, rep)
        if golden:
            in_specs = in_specs + (shp, shc, shc) + (rep,) * 6
        args = (src_y, src_u, src_v, ref_y, ref_u, ref_v, prev_mv,
                prev_mv16, dc_q, ac_q, lam, lf_lvl, lf_lim, lf_mblim)
        if golden:
            args = args + tuple(gold_and_rates)
        return shard_map(
            body, mesh=mesh,
            in_specs=in_specs,
            out_specs=(out_block, (shp, shc, shc)),
        )(*args)

    return jax.jit(step, donate_argnums=(3, 4, 5))


def make_rt_step_sharded(geom: Geom, mesh_shape, split16: bool = False,
                         golden: bool = False):
    """Product adapter: the multi-chip tile-column step behind RtSession.

    Presents the same call signature as ``make_pframe_step`` (single
    frame, border-extended refs in/out, raster-ordered block arrays) so
    the realtime session and serializer are shard-agnostic, while the
    compute runs shard_map'ed over a (1, n_tiles) device mesh — tile
    columns over ICI with BORDER-halo ring exchange (SURVEY §2.7 TP row).

    Requires: width % 64 == 0, cols32 % n_tiles == 0, n_tiles local
    devices.  Strip geometries (720p/4K) shard the bottom 16-strip along
    the same tile axis.  split16 is not yet sharded; sessions request
    the uniform 32 grid when a mesh is set.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    if split16:
        raise ValueError("split16 is not supported on the sharded step")
    n_tiles = 1
    for d in tuple(mesh_shape):
        n_tiles *= int(d)
    devs = jax.devices()
    if len(devs) < n_tiles:
        raise ValueError(
            f"mesh requests {n_tiles} devices, {len(devs)} available")
    mesh = Mesh(np.asarray(devs[:n_tiles]).reshape(1, n_tiles),
                ("frame", "tile"))
    base = make_pframe_step_sharded(geom, mesh, n_tiles, golden=golden)
    g = geom
    B = BORDER
    rows, cols = g.rows32, g.cols32
    cols_loc = cols // n_tiles

    def to_shard_major(pm):
        return pm.reshape(rows, n_tiles, cols_loc, 2) \
                 .transpose(1, 0, 2, 3).reshape(-1, 2)

    def to_raster(arr):
        lead = arr.shape[1:] if arr.ndim > 1 else ()
        return arr.reshape(n_tiles, rows, cols_loc, *lead) \
                  .transpose(1, 0, 2, *range(3, 3 + len(lead))) \
                  .reshape(rows * n_tiles * cols_loc, *lead)

    def step(src_y, src_u, src_v, ref_y, ref_u, ref_v, *rest):
        # rest layout mirrors make_pframe_step's golden variant:
        # [gold_y, gold_u, gold_v,] prev32, prev16, scalars[, rates x6]
        i = 3 if golden else 0
        gold = rest[:3] if golden else ()
        (prev_mv32, prev_mv16, dc_q, ac_q, lam, lf_lvl, lf_lim,
         lf_mblim) = rest[i : i + 8]
        rates = rest[i + 8 :]
        if g.strip:
            pm16 = prev_mv16[None]  # strip row: raster == shard-major
        else:
            import jax.numpy as jnp

            pm16 = jnp.zeros((1, n_tiles, 2), prev_mv32.dtype)
        extra = ()
        if golden:
            extra = tuple(p[B:-B, B:-B][None] for p in gold) + tuple(rates)
        outs, (nry, nru, nrv) = base(
            src_y[None], src_u[None], src_v[None],
            ref_y[B:-B, B:-B][None], ref_u[B:-B, B:-B][None],
            ref_v[B:-B, B:-B][None], to_shard_major(prev_mv32)[None],
            pm16, dc_q, ac_q, lam, lf_lvl, lf_lim, lf_mblim, *extra)
        m32 = {k: to_raster(outs[k][0]) for k in
               ("mv", "ref", "skip", "eob_y", "eob_u", "eob_v",
                "lv_y", "lv_u", "lv_v")}
        m32["dist"] = outs["dist"][0]
        m32["rate"] = outs["rate"][0]
        rec_y, rec_u, rec_v = nry[0], nru[0], nrv[0]
        out = {"m32": m32, "rec_y": rec_y, "rec_u": rec_u, "rec_v": rec_v}
        if g.strip:
            out["m16"] = {k: outs[f"m16_{k}"][0] for k in
                          ("mv", "ref", "skip", "eob_y", "eob_u", "eob_v",
                           "lv_y", "lv_u", "lv_v")}
        new_refs = (
            extend_borders_device(rec_y, g.width, g.height),
            extend_borders_device(rec_u, (g.width + 1) >> 1,
                                  (g.height + 1) >> 1),
            extend_borders_device(rec_v, (g.width + 1) >> 1,
                                  (g.height + 1) >> 1))
        return out, new_refs

    return jax.jit(step, donate_argnums=(3, 4, 5))
