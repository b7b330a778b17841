"""Realtime device-resident encode loop (low-delay IPPP, CQP/VBR).

This is the orchestration of the device EncDec step
(``pipeline/tpu_encdec.py``): the keyframe is produced by the host
wavefront encoder once per intra period, its reconstruction is uploaded
to the device, and every P frame thereafter is motion-estimated,
predicted, transformed and reconstructed entirely on the device — the
reference planes never leave HBM.  Per frame only the quantized levels,
eobs and MVs come back to the host, where the mode syntax is classified
against the normative MV-reference derivation (``codec/mv.py``) and the
tile is serialized (native C++ fast path when available, Python
otherwise).

The device step for frame N+1 is dispatched *before* frame N is
serialized, so host entropy coding overlaps device compute (the role of
the reference's process pipeline, ``EbEncHandle.c:1562-1697``).
"""

from __future__ import annotations

import numpy as np

from tpu_vp9.bitstream import tables as T
from tpu_vp9.bitstream.headers import FrameHeader, assemble_frame
from tpu_vp9.bitstream.tables import BlockSize, RefFrame, TxMode
from tpu_vp9.codec import modeinfo as MI
from tpu_vp9.codec import mv as MV
from tpu_vp9.codec.intra_frame import make_frame_state, walk_partition_fixed
from tpu_vp9.pipeline.encoder import EncodedFrame, _apply_loop_filter
from tpu_vp9.pipeline.tpu_encdec import (
    BORDER, Geom, make_geom, make_pframe_step, pad_plane,
)

LAST = int(RefFrame.LAST)


def _leaf_grid_index(geom: Geom, mi_row: int, mi_col: int, bsize):
    """Map a leaf to (zone, flat block index) in the device output."""
    if bsize == BlockSize.BLOCK_32X32:
        return "m32", (mi_row // 4) * geom.cols32 + (mi_col // 4)
    assert bsize == BlockSize.BLOCK_16X16
    return "m16", mi_col // 2


def classify_and_fill_state(frame, geom: Geom, host_out: dict,
                            qindex: int):
    """Build a FrameState from device outputs; classify inter modes.

    Decode-order walk: each leaf's NEAREST/NEAR/ZERO/NEW classification
    uses the normative mv-reference scan over already-final neighbors
    (vp9_mvref_common.c semantics; every block is single-ref LAST so
    the chosen MV is reproducible by whichever syntax mode is cheapest).
    Returns (FrameState, events).
    """
    g = geom
    st = make_frame_state(frame, g.mi_rows, g.mi_cols)
    events = walk_partition_fixed(g.mi_rows, g.mi_cols,
                                  BlockSize.BLOCK_32X32, 0)
    for ev, mi_row, mi_col, bsize, _ in events:
        if ev == "tile":
            st.tile_mi_start = mi_row
            st.mig.tile_mi_start, st.mig.tile_mi_end = mi_row, mi_col
            continue
        if ev != "leaf":
            continue
        zone, bi = _leaf_grid_index(g, mi_row, mi_col, bsize)
        z = host_out[zone]
        mv = (int(z["mv"][bi, 0]), int(z["mv"][bi, 1]))
        skip = bool(z["skip"][bi])
        mv_list, mode_context = MV.find_mv_refs(
            st.mig, mi_row, mi_col, bsize, LAST,
            st.mig.tile_mi_start, st.mig.tile_mi_end)
        nearest, near = MV.find_best_ref_mvs(
            mv_list, False, mi_row, mi_col, bsize, g.mi_rows, g.mi_cols)
        if mv == nearest:
            mode = 0
        elif mv == near:
            mode = 1
        elif mv == (0, 0):
            mode = 2
        else:
            mode = 3
        mi = MI.ModeInfo(bsize=bsize, tx_size=T.MAX_TX_SIZE[bsize],
                         skip=skip, is_inter=True, ref_frame=(LAST, -1),
                         mv=(mv, (0, 0)), inter_mode=mode)
        mi.mode_context = mode_context
        mi.best_ref_mv = nearest
        st.mig.set_block(mi_row, mi_col, bsize, mi)
        # levels / eobs for the serializer
        if bsize == BlockSize.BLOCK_32X32:
            st.levels[(0, mi_row * 2, mi_col * 2)] = z["lv_y"][bi]
            st.eobs[(0, mi_row * 2, mi_col * 2)] = int(z["eob_y"][bi])
        else:
            st.levels[(0, mi_row * 2, mi_col * 2)] = z["lv_y"][bi]
            st.eobs[(0, mi_row * 2, mi_col * 2)] = int(z["eob_y"][bi])
        st.levels[(1, mi_row, mi_col)] = z["lv_u"][bi]
        st.eobs[(1, mi_row, mi_col)] = int(z["eob_u"][bi])
        st.levels[(2, mi_row, mi_col)] = z["lv_v"][bi]
        st.eobs[(2, mi_row, mi_col)] = int(z["eob_v"][bi])
    return st, events


def _upload_refs(recon_planes, geom: Geom):
    """Pad host recon planes and border-extend them on device."""
    import jax.numpy as jnp

    from tpu_vp9.pipeline.tpu_encdec import extend_borders_device

    g = geom
    y = jnp.asarray(pad_plane(recon_planes[0], g.pad_h, g.pad_w))
    u = jnp.asarray(pad_plane(recon_planes[1], g.pad_h // 2, g.pad_w // 2))
    v = jnp.asarray(pad_plane(recon_planes[2], g.pad_h // 2, g.pad_w // 2))
    return (extend_borders_device(y, g.width, g.height),
            extend_borders_device(u, (g.width + 1) >> 1,
                                  (g.height + 1) >> 1),
            extend_borders_device(v, (g.width + 1) >> 1,
                                  (g.height + 1) >> 1))


def _device_out_to_host(outs, geom: Geom, want_recon: bool):
    """Materialize the per-frame device outputs needed by the host."""
    host = {}
    for zone in ("m32", "m16") if geom.strip else ("m32",):
        z = outs[zone]
        host[zone] = {k: np.asarray(z[k]) for k in
                      ("mv", "skip", "eob_y", "eob_u", "eob_v",
                       "lv_y", "lv_u", "lv_v")}
    if want_recon:
        host["rec"] = [np.asarray(outs["rec_y"]), np.asarray(outs["rec_u"]),
                       np.asarray(outs["rec_v"])]
    host["stats"] = (float(outs["m32"]["dist"]), int(outs["m32"]["rate"]))
    return host


def encode_stream_rt(frames, qindex: int = 100, intra_period: int = -1,
                     want_recon: bool = True, rc=None):
    """Device-resident realtime encode of an IPPP stream.

    frames: list of Frame420.  Returns list[EncodedFrame].  rc: optional
    RateControlState — per-frame qindex override (CQP when None).
    """
    import jax
    import jax.numpy as jnp

    from tpu_vp9.codec.intra_frame import encode_keyframe
    from tpu_vp9.ops.loopfilter import pick_filter_level, sharpness_limits

    first = frames[0]
    h, w = first.y.shape
    g = make_geom(w, h)
    step = make_pframe_step(g)
    lim_tbl, mblim_tbl = sharpness_limits(0)
    out = []
    refs = None
    prev_mv32 = jnp.zeros((g.n_blocks32, 2), jnp.int32)
    prev_mv16 = jnp.zeros((g.cols16 if g.strip else 1, 2), jnp.int32)
    pending = None  # (idx, hdr, device outs future)

    def finish(idx, hdr, outs, qidx):
        host = _device_out_to_host(outs, g, want_recon)
        st, events = classify_and_fill_state(frames[idx], g, host, qidx)
        from tpu_vp9.codec.inter_frame import serialize_pframe

        tile = serialize_pframe(st, events, qidx, fc=None,
                                tx_mode=TxMode.ALLOW_32X32)
        payload = assemble_frame(hdr, tile, None)
        if rc is not None:
            rc.update(len(payload) * 8, False)
        if want_recon:
            mi_h, mi_w = g.h_mi, g.w_mi
            for pidx in range(3):
                ss = 0 if pidx == 0 else 1
                st.planes[pidx].recon[: mi_h >> ss, : mi_w >> ss] = \
                    host["rec"][pidx][: mi_h >> ss, : mi_w >> ss]
        return EncodedFrame(payload=payload, is_keyframe=False,
                            qindex=qidx, state=st, pts=idx)

    for idx, frame in enumerate(frames):
        is_key = idx == 0 or (
            intra_period >= 0 and idx % (intra_period + 1) == 0)
        qidx = qindex if rc is None else rc.frame_qindex(is_key)
        if is_key:
            if pending is not None:
                out.append(finish(*pending))
                pending = None
            tile, st = encode_keyframe(frame, qidx, BlockSize.BLOCK_32X32)
            hdr = FrameHeader(width=w, height=h, is_keyframe=True,
                              error_resilient=True, base_qindex=qidx,
                              tx_mode=TxMode.ALLOW_32X32)
            _apply_loop_filter(st, hdr, qidx, True, enabled=True)
            payload = assemble_frame(hdr, tile, st.header_updates)
            out.append(EncodedFrame(payload=payload, is_keyframe=True,
                                    qindex=qidx, state=st, pts=idx))
            mi_h, mi_w = g.h_mi, g.w_mi
            recon = [st.planes[p].recon[: mi_h >> (0 if p == 0 else 1),
                                        : mi_w >> (0 if p == 0 else 1)]
                     for p in range(3)]
            refs = _upload_refs(recon, g)
            prev_mv32 = jnp.zeros_like(prev_mv32)
            prev_mv16 = jnp.zeros_like(prev_mv16)
            if rc is not None:
                rc.update(len(payload) * 8, True)
            continue
        # dispatch the device step for this frame
        src_y = jnp.asarray(pad_plane(np.asarray(frame.y), g.pad_h, g.pad_w))
        src_u = jnp.asarray(pad_plane(np.asarray(frame.u), g.pad_h // 2,
                                      g.pad_w // 2))
        src_v = jnp.asarray(pad_plane(np.asarray(frame.v), g.pad_h // 2,
                                      g.pad_w // 2))
        lf_lvl = pick_filter_level(qidx, False)
        dc_q = jnp.asarray(T.dc_quant(qidx), jnp.int32)
        ac_q = jnp.asarray(T.ac_quant(qidx), jnp.int32)
        lam = jnp.asarray(max(1, (T.ac_quant(qidx) ** 2) >> 6), jnp.int32)
        outs, refs = step(src_y, src_u, src_v, *refs, prev_mv32, prev_mv16,
                          dc_q, ac_q, lam,
                          jnp.asarray(lf_lvl, jnp.int32),
                          jnp.asarray(int(lim_tbl[lf_lvl]), jnp.int32),
                          jnp.asarray(int(mblim_tbl[lf_lvl]), jnp.int32))
        prev_mv32 = outs["m32"]["mv"].astype(jnp.int32)
        if g.strip:
            prev_mv16 = outs["m16"]["mv"].astype(jnp.int32)
        hdr = FrameHeader(
            width=w, height=h, is_keyframe=False, error_resilient=True,
            base_qindex=qidx, tx_mode=TxMode.ALLOW_32X32,
            refresh_frame_mask=0xFF, ref_dpb_index=(0, 0, 0))
        hdr.loop_filter.filter_level = lf_lvl
        # serialize the *previous* frame while this one runs on device
        if pending is not None:
            out.append(finish(*pending))
        pending = (idx, hdr, outs, qidx)
    if pending is not None:
        out.append(finish(*pending))
    return out
