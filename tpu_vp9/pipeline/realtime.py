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
    BORDER, Geom, make_geom, make_kframe_step, make_pframe_step, pad_plane,
)

LAST = int(RefFrame.LAST)


def _leaf_grid_index(geom: Geom, mi_row: int, mi_col: int, bsize,
                     split_mode: bool = False):
    """Map a leaf to (zone, flat block index) in the device output."""
    if bsize == BlockSize.BLOCK_32X32:
        return "m32", (mi_row // 4) * geom.cols32 + (mi_col // 4)
    assert bsize == BlockSize.BLOCK_16X16
    if split_mode:
        return "m16f", (mi_row // 2) * (geom.cols32 * 2) + (mi_col // 2)
    return "m16", mi_col // 2


def walk_partition_split(mi_rows: int, mi_cols: int, split32):
    """Decode-order events for the device's mixed 32/16 partitioning.

    Mirrors intra_frame.walk_partition_fixed's node semantics; at the
    32 level the partition follows split32[(mi_row//4, mi_col//4)].
    split32 must be 0 wherever a split child would need forced edge
    descent (pframe_step zeroes the overhang row)."""
    from tpu_vp9.bitstream.tables import Partition

    events = []

    def node(mi_row, mi_col, bsize):
        if mi_row >= mi_rows or mi_col >= mi_cols:
            return
        has_rows, has_cols = MI.partition_rule(
            bsize, mi_row, mi_col, mi_rows, mi_cols)
        bw = 1 << MI.MI_WIDTH_LOG2[bsize]
        if bsize == BlockSize.BLOCK_64X64:
            part = Partition.SPLIT
        elif bsize == BlockSize.BLOCK_32X32 and has_rows and has_cols:
            part = (Partition.SPLIT
                    if split32[mi_row // 4, mi_col // 4] else
                    Partition.NONE)
        elif has_rows and has_cols:
            part = Partition.NONE
        else:
            part = Partition.SPLIT  # forced descent at edges
        events.append(("part", mi_row, mi_col, bsize, part))
        if part == Partition.NONE:
            events.append(("leaf", mi_row, mi_col, bsize, None))
        else:
            sub = T.SUBSIZE[(Partition.SPLIT, bsize)]
            half = bw >> 1
            node(mi_row, mi_col, sub)
            node(mi_row, mi_col + half, sub)
            node(mi_row + half, mi_col, sub)
            node(mi_row + half, mi_col + half, sub)

    events.append(("tile", 0, mi_cols, None, None))
    for sb_r in range(0, mi_rows, 8):
        for sb_c in range(0, mi_cols, 8):
            node(sb_r, sb_c, BlockSize.BLOCK_64X64)
    return events


def classify_and_fill_state(frame, geom: Geom, host_out: dict,
                            qindex: int, prev_mvs=None):
    """Build a FrameState from device outputs; classify inter modes.

    Decode-order walk: each leaf's NEAREST/NEAR/ZERO/NEW classification
    uses the normative mv-reference scan over already-final neighbors
    (vp9_mvref_common.c semantics; every block is single-ref LAST so
    the chosen MV is reproducible by whichever syntax mode is cheapest).
    prev_mvs: previous frame's snapshot_mvs() when use_prev_frame_mvs
    holds at the decoder (non-er, prior frame shown inter, same size).
    Returns (FrameState, events).
    """
    g = geom
    st = make_frame_state(frame, g.mi_rows, g.mi_cols)
    split = host_out.get("split32")
    if split is not None:
        events = walk_partition_split(g.mi_rows, g.mi_cols, split)
    else:
        events = walk_partition_fixed(g.mi_rows, g.mi_cols,
                                      BlockSize.BLOCK_32X32, 0)
    for ev, mi_row, mi_col, bsize, _ in events:
        if ev == "tile":
            st.tile_mi_start = mi_row
            st.mig.tile_mi_start, st.mig.tile_mi_end = mi_row, mi_col
            continue
        if ev != "leaf":
            continue
        zone, bi = _leaf_grid_index(g, mi_row, mi_col, bsize,
                                    split_mode=split is not None)
        z = host_out[zone]
        mv = (int(z["mv"][bi, 0]), int(z["mv"][bi, 1]))
        skip = bool(z["skip"][bi])
        ref_id = LAST
        if "ref" in z and int(z["ref"][bi]):
            ref_id = (int(RefFrame.ALTREF) if int(z["ref"][bi]) == 2
                      else int(RefFrame.GOLDEN))
        mv_list, mode_context = MV.find_mv_refs(
            st.mig, mi_row, mi_col, bsize, ref_id,
            st.mig.tile_mi_start, st.mig.tile_mi_end, prev_mvs=prev_mvs)
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
                         skip=skip, is_inter=True, ref_frame=(ref_id, -1),
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


def _scan_prefix_on(outs, zones) -> bool:
    """True when every zone shipped int8 scan prefixes — the compressed
    device->host transfer mode (the axon tunnel moves ~23 MB/s; full
    1080p level planes cost ~590 ms/frame, the prefixes ~25 ms).
    Blocks whose coefficients don't fit the prefix (eob past K or
    |level| > 127) are flagged in a per-block mask and their full 2-D
    planes fetched individually."""
    import os

    if "hostblob" not in outs \
            and os.environ.get("TPU_VP9_NO_SCAN_PREFIX") == "1":
        return False
    # e.g. mesh-sharded zones ship 2-D planes only
    return all("lvs_y" in outs[z] for z in zones)


def _device_out_to_host(outs, geom: Geom, want_recon: bool):
    """Materialize the per-frame device outputs needed by the host.

    When the step packed a single "hostblob" (one d2h copy on the slow
    tunnel), everything is sliced out of it; otherwise (mesh-sharded
    steps) each array is fetched individually."""
    from tpu_vp9.pipeline.tpu_encdec import SCAN_PREFIX_K, unpack_host_blob

    host = {}
    zones = ["m32"]
    if geom.strip:
        zones.append("m16")
    if "m16f" in outs:
        zones.append("m16f")
    if "hostblob" in outs:
        blob = np.asarray(outs["hostblob"])
        host = unpack_host_blob(blob, outs, want_recon)
        scan = _scan_prefix_on(outs, zones)
    else:
        scan = _scan_prefix_on(outs, zones)
        if "m16f" in outs:
            host["split32"] = np.asarray(outs["split32"])
        for zone in zones:
            z = outs[zone]
            keys = ["mv", "skip", "eob_y", "eob_u", "eob_v"]
            keys += (["lvs_y", "lvs_u", "lvs_v", "of_cnt", "of_idx",
                      "of_lv_y", "of_lv_u", "of_lv_v"] if scan
                     else ["lv_y", "lv_u", "lv_v"])
            if "ref" in z:
                keys.append("ref")
            if "sel_idx" in z:
                keys.append("sel_idx")
            host[zone] = {k: np.asarray(z[k]) for k in keys}
        host["m32"]["dist"] = np.asarray(outs["m32"]["dist"])
        host["m32"]["rate"] = np.asarray(outs["m32"]["rate"])
        if want_recon:
            host["rec"] = [np.asarray(outs["rec_y"]),
                           np.asarray(outs["rec_u"]),
                           np.asarray(outs["rec_v"])]
    clean = True
    if scan:
        for zone in zones:
            hz = host[zone]
            of_cnt = int(hz["of_cnt"])
            if of_cnt:
                clean = False
            idx = hz["of_idx"]
            sel = idx >= 0
            flag = hz.get("of_flag")
            covered = set(int(i) for i in idx[sel])
            # blocks beyond the in-blob full-row buffer go through the
            # tier-2 batched gather
            tier2 = [int(i) for i in
                     (np.nonzero(flag)[0] if flag is not None else [])
                     if int(i) not in covered]
            hz["of_idx"] = idx[sel]
            for k in ("of_lv_y", "of_lv_u", "of_lv_v"):
                hz[k] = hz[k][sel]
            if tier2:
                if not _fetch_overflow_tier2(hz, outs[zone],
                                             np.asarray(tier2)):
                    from tpu_vp9.utils.trace import notice

                    notice("rt overflow tier-2 gather exceeded "
                           f"({len(tier2)} blocks); full-plane fetch")
                    for k in ("lv_y", "lv_u", "lv_v"):
                        hz[k] = np.asarray(outs[zone][k])
                    for k in ("lvs_y", "lvs_u", "lvs_v"):
                        hz.pop(k, None)
    _expand_m16f(host, geom)
    host["scan_ks"] = ((SCAN_PREFIX_K[32], SCAN_PREFIX_K[16],
                        SCAN_PREFIX_K[16], SCAN_PREFIX_K[8])
                       if scan and clean else (0, 0, 0, 0))
    if scan and not clean:
        _reconstruct_levels(host, geom)
    if want_recon and "rec" not in host:
        host["rec"] = [host.pop("rec_y"), host.pop("rec_u"),
                       host.pop("rec_v")]
    host["stats"] = (float(host["m32"]["dist"]), int(host["m32"]["rate"]))
    return host


OF_TIER2 = 256  # static row count of the second-tier overflow gather


def _fetch_overflow_tier2(hz, zdev, idx) -> bool:
    """Batched device gather of the given blocks' FULL 2-D level rows
    (static OF_TIER2 padding -> one cached executable + one small
    transfer), for blocks the in-blob int16 prefixes can't serve.
    Returns False if more than OF_TIER2 rows are asked for."""
    idx = np.asarray(idx, np.int64)
    if idx.size > OF_TIER2:
        return False
    import jax.numpy as jnp

    pad = np.zeros((OF_TIER2,), np.int32)
    pad[: idx.size] = idx
    padj = jnp.asarray(pad)
    rows = [np.asarray(jnp.take(zdev[k], padj, axis=0))
            for k in ("lv_y", "lv_u", "lv_v")]
    prev = hz.get("of2_idx")
    if prev is not None and len(prev):
        hz["of2_idx"] = np.concatenate([np.asarray(prev, np.int64), idx])
        for k, r in zip(("of2_lv_y", "of2_lv_u", "of2_lv_v"), rows):
            hz[k] = np.concatenate([hz[k], r[: idx.size]], axis=0)
    else:
        hz["of2_idx"] = idx
        for k, r in zip(("of2_lv_y", "of2_lv_u", "of2_lv_v"), rows):
            hz[k] = r[: idx.size]
    return True


def _expand_m16f(host, geom: Geom):
    """Scatter the masked child-zone outputs (4K arrays for the K
    probe-selected parents) into full 16-grid arrays so the walk /
    serializer stay selection-agnostic.  Child order: k*4 + 2*i + j."""
    z = host.get("m16f")
    if z is None or "sel_idx" not in z:
        return
    g = geom
    sel = np.asarray(z.pop("sel_idx"), np.int64)
    cols16 = g.cols32 * 2
    b16 = g.rows32 * 2 * cols16
    pr, pc = sel // g.cols32, sel % g.cols32
    ii = np.array([0, 0, 1, 1])
    jj = np.array([0, 1, 0, 1])
    cidx = ((2 * pr[:, None] + ii[None]) * cols16
            + 2 * pc[:, None] + jj[None]).reshape(-1)  # (4K,)
    for k in list(z):
        if k in ("of_cnt",):
            continue
        if k in ("of_idx", "of2_idx"):
            idx = z[k]
            z[k] = np.where(idx >= 0, cidx[np.clip(idx, 0, None)], -1)
            continue
        if k.startswith("of_") or k.startswith("of2_"):
            continue  # overflow rows follow their idx, already child rows
        arr = z[k]
        full = np.zeros((b16,) + arr.shape[1:], arr.dtype)
        full[cidx] = arr
        z[k] = full


def _reconstruct_levels(host, geom: Geom):
    """Expand int8 scan prefixes back to full 2-D level planes (for the
    Python fallback serializer, and whenever some blocks overflowed the
    prefix — their individually-fetched full planes are patched in)."""
    from tpu_vp9.bitstream.tables import TxSize, TxType

    _ts = {32: TxSize.TX_32X32, 16: TxSize.TX_16X16, 8: TxSize.TX_8X8}
    for zone, n in (("m32", 32), ("m16f", 16), ("m16", 16)):
        z = host.get(zone)
        if z is None or "lv_y" in z:
            continue
        for pk, sk, nn in (("lv_y", "lvs_y", n), ("lv_u", "lvs_u", n // 2),
                           ("lv_v", "lvs_v", n // 2)):
            pre = np.asarray(z[sk], np.int16)
            nb, kk = pre.shape
            order = np.asarray(T.scan_order(_ts[nn], TxType.DCT_DCT)[0])
            full = np.zeros((nb, nn * nn), np.int16)
            full[:, order[:kk]] = pre
            full = full.reshape(nb, nn, nn)
            if "of_idx" in z and len(z["of_idx"]):
                full[z["of_idx"]] = z["of_" + pk]
            if "of2_idx" in z and len(z["of2_idx"]):
                full[z["of2_idx"]] = z["of2_" + pk]
            z[pk] = full


def serialize_device_frame(g: Geom, host, hdr, fc0, er: bool, prev_mvs,
                           sign_bias=(0, 0, 0, 0)):
    """Native 2-pass whole-tile serialization of one device frame.

    Pass 1 collects symbol counts against fc0, the header's forward
    probability updates are optimized from them, and pass 2 emits the
    final tile (byte-identical to the Python oracle serializer).
    Returns (payload, grid_fields, counts, fc_final) or None when the
    native library can't take this configuration."""
    import os

    from tpu_vp9 import native as nat
    from tpu_vp9.bitstream.prob_update import (
        optimize_binary_probs, optimize_coef_probs,
    )
    from tpu_vp9.bitstream.tables import TxSize

    if os.environ.get("TPU_VP9_NO_NATIVE_SER") == "1":
        return None
    lib = nat.get_lib()
    if lib is None or not hasattr(lib, "rt_serialize"):
        return None
    m32 = dict(host["m32"])
    m32.setdefault("ref", None)
    m16f = None
    split32 = host.get("split32")
    if split32 is not None:
        m16f = dict(host["m16f"])
        m16f.setdefault("ref", None)
    strip = None
    if g.strip:
        strip = dict(host["m16"])
        strip.setdefault("ref", None)
    scan_ks = host.get("scan_ks", (0, 0, 0, 0))
    r1 = nat.native_rt_serialize(g, split32, m32, m16f, strip,
                                 prev_mvs, fc0, counts_on=not er,
                                 scan_ks=scan_ks, sign_bias=sign_bias)
    if r1 is None:
        return None
    tile1, counts, fields, _ = r1
    if er:
        tile, updates, fc_final = tile1, None, None
    else:
        coefc = {ts: counts[("coef", ts)] for ts in TxSize}
        eobc = {ts: counts[("eob", ts)] for ts in TxSize}
        new_coef, flags = optimize_coef_probs(fc0, coefc, eobc)
        new_skip = optimize_binary_probs(
            fc0.skip_probs, counts["skip"][:, 0], counts["skip"][:, 1])
        fc1 = fc0.copy()
        updates = {"coef": {}, "skip": (fc0.skip_probs.copy(), new_skip)}
        for ts in TxSize:
            updates["coef"][ts] = (fc0.coef_probs[ts].copy(),
                                   new_coef[ts], flags[ts])
            fc1.coef_probs[ts] = new_coef[ts]
        fc1.skip_probs = new_skip
        r2 = nat.native_rt_serialize(g, split32, m32, m16f, strip,
                                     prev_mvs, fc1, counts_on=False,
                                     scan_ks=scan_ks, sign_bias=sign_bias)
        if r2 is None:
            return None
        tile, _, fields, _ = r2
        fc_final = fc1
    payload = assemble_frame(hdr, tile, updates)
    return payload, fields, counts, fc_final


class RtSession:
    """Streaming device-resident low-delay encoder session.

    Frame-context persistence is on by default (error_resilient=False):
    every frame is serialized against the inherited context, carries
    forward (subexp-coded) probability updates in its compressed header,
    and the context backward-adapts from the frame's symbol counts after
    serialization (frame_parallel_decoding=False), exactly the libvpx
    coding model the host path ships.  Temporal (prev-frame) MV
    candidates enter the normative mv-ref scan whenever a conformant
    decoder would use them.  error_resilient=True restores the round-2
    behavior: default probabilities and no temporal MVs per frame.
    """

    def __init__(self, width: int, height: int, *, intra_period: int = -1,
                 rc=None, error_resilient: bool = False,
                 frame_parallel_decoding: bool = False,
                 want_recon: bool = True, loop_filter: bool = True,
                 split16: bool = False, golden: bool = False,
                 golden_interval: int = 8, mesh_shape=None,
                 aq: bool = False):
        import jax.numpy as jnp

        from tpu_vp9.ops.loopfilter import sharpness_limits

        self.g = make_geom(width, height)
        self.w, self.h = width, height
        self.intra_period = intra_period
        self.rc = rc
        self.er = error_resilient
        self.fpdm = error_resilient or frame_parallel_decoding
        self.want_recon = want_recon
        self.loop_filter = loop_filter
        # 32-vs-16 partition decision needs a strip-free geometry
        self.split16 = split16 and not self.g.strip
        # long-term GOLDEN anchor in HBM with per-block ref choice (the
        # reference's RPS keeps LAST + GOLDEN + ALTREF live; the RT
        # low-delay set uses LAST + a periodically-refreshed GOLDEN)
        self.golden = golden
        self.golden_interval = golden_interval
        self.mesh_shape = mesh_shape  # multi-chip tile-column sharding
        if mesh_shape is not None:
            # sharded sessions keep the GOLDEN anchor (halo-exchanged
            # like LAST; byte-identical to single-chip, r5); the
            # masked split16 descent stays single-chip-only — its
            # global top-K probe selection has no shard-invariant
            # fixed-shape formulation yet
            from tpu_vp9.utils.trace import notice

            if self.split16:
                notice("mesh-sharded realtime session: split16 descent "
                       "disabled (uniform 32 grid + GOLDEN)")
            self.split16 = False
            from tpu_vp9.pipeline.tpu_shard import make_rt_step_sharded

            self._step = make_rt_step_sharded(self.g, mesh_shape,
                                              golden=golden)
        else:
            import os

            # TPU_VP9_NO_SCAN_PREFIX=1 keeps the legacy per-array
            # full-plane transfer (A/B baseline for the blob path)
            blob = (None if os.environ.get("TPU_VP9_NO_SCAN_PREFIX") == "1"
                    else self.want_recon)
            # descent budget: K = B32/descend_frac probe-selected
            # parents (ADP); TPU_VP9_DESCEND_FRAC overrides (1 = full
            # descent, the quality operating point)
            dfrac = int(os.environ.get("TPU_VP9_DESCEND_FRAC", "4"))
            self._step = make_pframe_step(self.g, split16=self.split16,
                                          golden=golden, blob_recon=blob,
                                          aq=aq and golden,
                                          descend_frac=dfrac)
        # device keyframe wavefront (incl. strip geometries; mesh
        # sessions run it replicated — keyframes are rare and the
        # wavefront is latency-bound, so sharding it isn't worth ICI
        # traffic — keeping mesh streams byte-identical to single-chip)
        self._kstep = make_kframe_step(self.g)
        self._lim_tbl, self._mblim_tbl = sharpness_limits(0)
        self._fc = [T.default_frame_context() for _ in range(4)]
        self._refs = None
        self._gold = None
        self._since_gold = 0
        self._rates_key = None
        self._rates_dev = None
        self._prev_mv32 = jnp.zeros((self.g.n_blocks32, 2), jnp.int32)
        # split16 children carry no temporal candidate (ZERO/NEW/PARENT
        # only), so only strip geometries track a 16-grid motion field
        self._prev_mv16 = jnp.zeros(
            (self.g.cols16 if self.g.strip else 1, 2), jnp.int32)
        self._pending = None  # (frame, idx, hdr, device outs, qidx)
        self._prev_snap = None  # mv snapshot of the last serialized frame
        self._last_was_inter = False
        self._idx = 0
        # async serialization worker (EbEntropyCodingProcess.c's role as
        # a pipeline stage): frame N-1's HOST serialization (pure
        # numpy/C++, no jax calls — device fetches stay on the main
        # thread so they never contend with dispatches) runs on a
        # worker thread while frame N's device step runs.  CQP only:
        # rate-controlled sessions need rc.update before the next
        # frame_qindex, so they stay synchronous.  The device rate
        # tables always read the frame context captured at the last
        # JOIN (the post-(N-2) state) — deterministic regardless of
        # thread timing.
        self._ser_async = rc is None
        self._ser_pool = None
        self._futs = None
        self._rates_fc = self._fc[0]
        if self._ser_async:
            import collections
            import concurrent.futures as cf

            self._ser_pool = cf.ThreadPoolExecutor(max_workers=1)
            self._futs = collections.deque()

    def _drain_futs(self, out):
        if self._futs:
            while self._futs:
                ef, fc = self._futs.popleft().result()
                self._rates_fc = fc
                out.append(ef)
        return out

    def _rate_args(self, qidx: int):
        """Device uploads of the frame's entropy rate tables (cached by
        (frame-context identity, qindex))."""
        import jax.numpy as jnp

        from tpu_vp9.pipeline.tpu_encdec import make_rate_tabs

        fc = self._rates_fc if self._ser_async else self._fc[0]
        key = (id(fc), qidx)
        if self._rates_key != key:
            t = make_rate_tabs(fc, qidx)
            self._rates_dev = (jnp.asarray(t["mode_cost"]),
                               jnp.asarray(t["joint_cost"]),
                               jnp.asarray(t["nmv_row"]),
                               jnp.asarray(t["nmv_col"]),
                               jnp.asarray(t["ref_cost"]),
                               jnp.asarray(t["lam_bits"]))
            self._rates_key = key
        return self._rates_dev

    # -- frame-context chain (matches the decoder's refresh rules) ------
    def _fc_update(self, st, hdr, is_key: bool, fc_base):
        from tpu_vp9.codec.adapt import adapt_frame_context

        after_key = (not is_key) and not self._last_was_inter
        if not self.er and hdr.refresh_frame_context:
            if self.fpdm:
                if getattr(st, "fc_final", None) is not None:
                    self._fc[hdr.frame_context_idx] = st.fc_final
            elif getattr(st, "counts", None) is not None:
                self._fc[hdr.frame_context_idx] = adapt_frame_context(
                    fc_base if fc_base is not None
                    else T.default_frame_context(),
                    st.counts, is_key=is_key, after_key=after_key,
                    tx_select=hdr.tx_mode == TxMode.TX_MODE_SELECT,
                    final_fc=getattr(st, "fc_final", None))
        self._last_was_inter = not is_key

    def _finish_native(self, frame, idx, hdr, host, qidx, prev_mvs):
        """Whole-tile native serialization (rt_serialize: fused
        classification + mode syntax + tokens + counts in C++) — the
        host-side wall of the 1080p flagship path.  Returns an
        EncodedFrame or None when the native library can't take this
        configuration."""
        g = self.g
        fc0 = (T.default_frame_context() if self.er
               else self._fc[0].copy())
        r = serialize_device_frame(g, host, hdr, fc0, self.er, prev_mvs)
        if r is None:
            return None
        payload, fields, counts, fc_final = r
        # light state: planes for recon consumers + the motion field for
        # the next frame's temporal candidates (no per-block objects)
        st = make_frame_state(frame, g.mi_rows, g.mi_cols)
        mig = st.mig
        (mig.f_inter[:], mig.f_ref0[:], mig.f_ref1[:], mig.f_mode[:],
         mig.f_mv[:], mig.f_mv1[:], mig.f_skip[:]) = (
            fields[0].astype(bool), fields[1], fields[2], fields[3],
            fields[4], fields[5], fields[6].astype(bool))
        st.counts = counts
        st.fc_final = fc_final
        if not self.er:
            self._fc_update(st, hdr, False, fc0)
            self._prev_snap = mig.snapshot_mvs()
        else:
            self._last_was_inter = True
        if self.rc is not None:
            self.rc.update(len(payload) * 8, False)
        if self.want_recon:
            mi_h, mi_w = g.h_mi, g.w_mi
            for pidx in range(3):
                ss = 0 if pidx == 0 else 1
                st.planes[pidx].recon[: mi_h >> ss, : mi_w >> ss] = \
                    host["rec"][pidx][: mi_h >> ss, : mi_w >> ss]
        return EncodedFrame(payload=payload, is_keyframe=False,
                            qindex=qidx, state=st, pts=idx)

    def _finish(self, frame, idx, hdr, outs, qidx):
        from tpu_vp9.utils.trace import span

        with span("rt_d2h_transfer"):
            host = _device_out_to_host(outs, self.g, self.want_recon)
        return self._finish_host(frame, idx, hdr, host, qidx)

    def _finish_host(self, frame, idx, hdr, host, qidx):
        """Serialize an already-materialized frame (host-only work: this
        runs while the NEXT frame's device step is in flight — the
        transfer itself must happen while the device is idle, or it
        queues behind that step on the single tunnel stream)."""
        import functools

        from tpu_vp9.codec.fwd_update import serialize_with_updates
        from tpu_vp9.codec.inter_frame import serialize_pframe
        from tpu_vp9.utils.trace import span

        g = self.g
        prev_mvs = (self._prev_snap
                    if (not self.er and self._last_was_inter) else None)
        with span("rt_serialize_native"):
            ef = self._finish_native(frame, idx, hdr, host, qidx, prev_mvs)
        if ef is not None:
            return ef
        if any(host.get("scan_ks", ())):
            _reconstruct_levels(host, g)
        st, events = classify_and_fill_state(frame, g, host, qidx,
                                             prev_mvs=prev_mvs)
        if self.er:
            tile = serialize_pframe(st, events, qidx, fc=None,
                                    tx_mode=TxMode.ALLOW_32X32)
            updates = None
        else:
            fc_base = self._fc[0]
            ser = functools.partial(serialize_pframe,
                                    tx_mode=TxMode.ALLOW_32X32)
            tile, updates, st.fc_final, st.counts = serialize_with_updates(
                st, events, qidx, ser, fc_base)
        payload = assemble_frame(hdr, tile, updates)
        if not self.er:
            self._fc_update(st, hdr, False, self._fc[0])
            self._prev_snap = st.mig.snapshot_mvs()
        else:
            self._last_was_inter = True
        if self.rc is not None:
            self.rc.update(len(payload) * 8, False)
        if self.want_recon:
            mi_h, mi_w = g.h_mi, g.w_mi
            for pidx in range(3):
                ss = 0 if pidx == 0 else 1
                st.planes[pidx].recon[: mi_h >> ss, : mi_w >> ss] = \
                    host["rec"][pidx][: mi_h >> ss, : mi_w >> ss]
        return EncodedFrame(payload=payload, is_keyframe=False,
                            qindex=qidx, state=st, pts=idx)

    def _encode_key_device(self, frame, idx, qidx):
        """Keyframe on the device: wavefront intra MD + recon via
        kframe_step — no host encode, no reference re-upload (the 1.8
        s/1080p host keyframe stall of VERDICT r3 missing #2)."""
        import functools

        import jax.numpy as jnp

        from tpu_vp9.bitstream.tables import IntraMode, TxSize
        from tpu_vp9.codec.fwd_update import serialize_with_updates
        from tpu_vp9.codec.intra_frame import serialize_frame
        from tpu_vp9.codec.modeinfo import ModeInfo
        from tpu_vp9.ops.loopfilter import pick_filter_level

        g = self.g
        self._fc = [T.default_frame_context() for _ in range(4)]
        src_y = jnp.asarray(pad_plane(np.asarray(frame.y), g.pad_h,
                                      g.pad_w))
        src_u = jnp.asarray(pad_plane(np.asarray(frame.u), g.pad_h // 2,
                                      g.pad_w // 2))
        src_v = jnp.asarray(pad_plane(np.asarray(frame.v), g.pad_h // 2,
                                      g.pad_w // 2))
        lf_lvl = pick_filter_level(qidx, True) if self.loop_filter else 0
        lam = max(1, (T.ac_quant(qidx) ** 2) >> 6)
        outs, self._refs = self._kstep(
            src_y, src_u, src_v, jnp.asarray(T.dc_quant(qidx), jnp.int32),
            jnp.asarray(T.ac_quant(qidx), jnp.int32),
            jnp.asarray(lam, jnp.int32), jnp.asarray(lf_lvl, jnp.int32),
            jnp.asarray(int(self._lim_tbl[lf_lvl]), jnp.int32),
            jnp.asarray(int(self._mblim_tbl[lf_lvl]), jnp.int32))
        if self.golden:
            self._gold = tuple(jnp.copy(p) for p in self._refs)
            self._since_gold = 0
        self._prev_mv32 = jnp.zeros_like(self._prev_mv32)
        self._prev_mv16 = jnp.zeros_like(self._prev_mv16)
        # host: fill the frame state from the device decisions, serialize
        keys = ("mode", "skip", "eob_y", "eob_u", "eob_v",
                "lv_y", "lv_u", "lv_v")
        host = {k: np.asarray(outs["m32"][k]) for k in keys}
        host16 = ({k: np.asarray(outs["m16"][k]) for k in keys}
                  if "m16" in outs else None)
        st = make_frame_state(frame, g.mi_rows, g.mi_cols)
        events = walk_partition_fixed(g.mi_rows, g.mi_cols,
                                      BlockSize.BLOCK_32X32, 0)
        for ev, mi_row, mi_col, bsize, _ in events:
            if ev != "leaf":
                continue
            if bsize == BlockSize.BLOCK_32X32:
                z = host
                bi = (mi_row // 4) * g.cols32 + (mi_col // 4)
                ts = TxSize.TX_32X32
            else:
                # bottom 16-strip of a strip geometry
                assert bsize == BlockSize.BLOCK_16X16 and host16
                z = host16
                bi = mi_col // 2
                ts = TxSize.TX_16X16
            m = IntraMode(int(z["mode"][bi]))
            mi = ModeInfo(bsize=bsize, y_mode=m, uv_mode=m, tx_size=ts,
                          skip=bool(z["skip"][bi]), is_inter=False)
            st.mig.set_block(mi_row, mi_col, bsize, mi)
            st.levels[(0, mi_row * 2, mi_col * 2)] = z["lv_y"][bi]
            st.eobs[(0, mi_row * 2, mi_col * 2)] = int(z["eob_y"][bi])
            st.levels[(1, mi_row, mi_col)] = z["lv_u"][bi]
            st.eobs[(1, mi_row, mi_col)] = int(z["eob_u"][bi])
            st.levels[(2, mi_row, mi_col)] = z["lv_v"][bi]
            st.eobs[(2, mi_row, mi_col)] = int(z["eob_v"][bi])
        tile, updates, st.fc_final, st.counts = serialize_with_updates(
            st, events, qidx, functools.partial(serialize_frame), None)
        hdr = FrameHeader(width=self.w, height=self.h, is_keyframe=True,
                          error_resilient=self.er, base_qindex=qidx,
                          tx_mode=TxMode.ALLOW_32X32,
                          refresh_frame_context=not self.er,
                          frame_parallel_decoding_mode=self.fpdm)
        hdr.loop_filter.filter_level = lf_lvl
        # uniform device LF: intra ref delta (+1 scale) switched off
        hdr.loop_filter.mode_ref_delta_enabled = False
        payload = assemble_frame(hdr, tile, updates)
        self._fc_update(st, hdr, True, None)
        self._rates_fc = self._fc[0]
        self._prev_snap = None
        if self.want_recon:
            mi_h, mi_w = g.h_mi, g.w_mi
            recs = [np.asarray(outs["rec_y"]), np.asarray(outs["rec_u"]),
                    np.asarray(outs["rec_v"])]
            for pidx in range(3):
                ss = 0 if pidx == 0 else 1
                st.planes[pidx].recon[: mi_h >> ss, : mi_w >> ss] = \
                    recs[pidx][: mi_h >> ss, : mi_w >> ss]
        if self.rc is not None:
            self.rc.update(len(payload) * 8, True)
        return EncodedFrame(payload=payload, is_keyframe=True,
                            qindex=qidx, state=st, pts=idx)

    def _encode_key(self, frame, idx, qidx):
        from tpu_vp9.codec.intra_frame import encode_keyframe

        g = self.g
        if self._kstep is not None:
            return self._encode_key_device(frame, idx, qidx)
        # keyframes reset every context (setup_past_independence)
        self._fc = [T.default_frame_context() for _ in range(4)]
        tile, st = encode_keyframe(frame, qidx, BlockSize.BLOCK_32X32)
        hdr = FrameHeader(width=self.w, height=self.h, is_keyframe=True,
                          error_resilient=self.er, base_qindex=qidx,
                          tx_mode=TxMode.ALLOW_32X32,
                          refresh_frame_context=not self.er,
                          frame_parallel_decoding_mode=self.fpdm)
        _apply_loop_filter(st, hdr, qidx, True, enabled=self.loop_filter)
        payload = assemble_frame(hdr, tile, st.header_updates)
        self._fc_update(st, hdr, True, None)
        self._rates_fc = self._fc[0]
        self._prev_snap = None
        mi_h, mi_w = g.h_mi, g.w_mi
        recon = [st.planes[p].recon[: mi_h >> (0 if p == 0 else 1),
                                    : mi_w >> (0 if p == 0 else 1)]
                 for p in range(3)]
        self._refs = _upload_refs(recon, g)
        import jax.numpy as jnp

        if self.golden:
            # keyframes refresh every DPB slot; GOLDEN gets its own HBM
            # copy (the LAST planes are donated to the next step)
            self._gold = tuple(jnp.copy(p) for p in self._refs)
            self._since_gold = 0
        self._prev_mv32 = jnp.zeros_like(self._prev_mv32)
        self._prev_mv16 = jnp.zeros_like(self._prev_mv16)
        if self.rc is not None:
            self.rc.update(len(payload) * 8, True)
        return EncodedFrame(payload=payload, is_keyframe=True,
                            qindex=qidx, state=st, pts=idx)

    def stage(self, frame):
        """Pre-upload one picture to HBM (padded device planes).

        Streaming deployments feed `send` host frames and pay the
        ingest transfer inline; callers that already hold the source on
        device (or want the reference's RAM-resident-input timing
        model) stage frames ahead and pass the returned tuple to
        `send`."""
        import jax.numpy as jnp

        g = self.g
        return (
            jnp.asarray(pad_plane(np.asarray(frame.y), g.pad_h, g.pad_w)),
            jnp.asarray(pad_plane(np.asarray(frame.u), g.pad_h // 2,
                                  g.pad_w // 2)),
            jnp.asarray(pad_plane(np.asarray(frame.v), g.pad_h // 2,
                                  g.pad_w // 2)))

    def send(self, frame, qindex: int = 100, force_keyframe: bool = False):
        """Encode one picture; returns 0..2 EncodedFrames (1-frame
        latency: the device step for frame N overlaps frame N-1's host
        serialization, the reference's process-pipeline role).

        frame: a Frame420, or a staged (y, u, v) device tuple from
        ``stage`` (device tuples cannot start a keyframe: the wavefront
        keyframe path re-derives host state from the Frame420)."""
        import jax.numpy as jnp

        from tpu_vp9.ops.loopfilter import pick_filter_level

        g = self.g
        idx = self._idx
        self._idx += 1
        is_key = force_keyframe or idx == 0 or (
            self.intra_period >= 0
            and idx % (self.intra_period + 1) == 0)
        qidx = qindex if self.rc is None else self.rc.frame_qindex(is_key)
        out = []
        staged = isinstance(frame, tuple)
        if is_key:
            if staged:
                raise ValueError("staged frames cannot be keyframes")
            self._drain_futs(out)
            if self._pending is not None:
                out.append(self._finish(*self._pending))
                self._pending = None
            out.append(self._encode_key(frame, idx, qidx))
            return out
        if staged:
            src_y, src_u, src_v = frame
            # host-state stand-in (sources are only read by PSNR/recon
            # consumers, which streaming/staged callers don't use)
            if getattr(self, "_zero_frame", None) is None:
                from tpu_vp9.utils.yuv import Frame420

                self._zero_frame = Frame420(
                    y=np.zeros((self.h, self.w), np.uint8),
                    u=np.zeros(((self.h + 1) // 2, (self.w + 1) // 2),
                               np.uint8),
                    v=np.zeros(((self.h + 1) // 2, (self.w + 1) // 2),
                               np.uint8))
            frame = self._zero_frame
        else:
            src_y, src_u, src_v = self.stage(frame)
        lf_lvl = pick_filter_level(qidx, False) if self.loop_filter else 0
        dc_q = jnp.asarray(T.dc_quant(qidx), jnp.int32)
        ac_q = jnp.asarray(T.ac_quant(qidx), jnp.int32)
        lam = jnp.asarray(max(1, (T.ac_quant(qidx) ** 2) >> 6), jnp.int32)
        lf_args = (jnp.asarray(lf_lvl, jnp.int32),
                   jnp.asarray(int(self._lim_tbl[lf_lvl]), jnp.int32),
                   jnp.asarray(int(self._mblim_tbl[lf_lvl]), jnp.int32))
        refresh_gold = False
        if self.golden:
            self._since_gold += 1
            refresh_gold = self._since_gold >= self.golden_interval
            outs, self._refs = self._step(
                src_y, src_u, src_v, *self._refs, *self._gold,
                self._prev_mv32, self._prev_mv16, dc_q, ac_q, lam,
                *lf_args, *self._rate_args(qidx))
            if refresh_gold:
                self._gold = tuple(jnp.copy(p) for p in self._refs)
                self._since_gold = 0
        else:
            outs, self._refs = self._step(
                src_y, src_u, src_v, *self._refs, self._prev_mv32,
                self._prev_mv16, dc_q, ac_q, lam, *lf_args)
        self._prev_mv32 = outs["m32"]["mv"].astype(jnp.int32)
        if g.strip:
            self._prev_mv16 = outs["m16"]["mv"].astype(jnp.int32)
        # start device->host copies now so they overlap the previous
        # frame's host serialization below (transfers are the largest
        # host-visible cost at 1080p)
        zones = ["m32"]
        if g.strip:
            zones.append("m16")
        if self.split16:
            zones.append("m16f")
            if hasattr(outs["split32"], "copy_to_host_async"):
                outs["split32"].copy_to_host_async()
        import os
        if "hostblob" in outs:
            if hasattr(outs["hostblob"], "copy_to_host_async"):
                outs["hostblob"].copy_to_host_async()
        else:
            scan_pref = (os.environ.get("TPU_VP9_NO_SCAN_PREFIX") != "1"
                         and all("lvs_y" in outs[z] for z in zones))
            lv_keys = (("lvs_y", "lvs_u", "lvs_v", "of_cnt", "of_idx",
                        "of_lv_y", "of_lv_u", "of_lv_v") if scan_pref
                       else ("lv_y", "lv_u", "lv_v"))
            for zone in zones:
                for k in ("mv", "skip", "eob_y", "eob_u", "eob_v",
                          "ref", "sel_idx") + lv_keys:
                    arr = outs[zone].get(k)
                    if arr is not None and hasattr(arr,
                                                   "copy_to_host_async"):
                        arr.copy_to_host_async()
            if self.want_recon:
                for k in ("rec_y", "rec_u", "rec_v"):
                    if hasattr(outs[k], "copy_to_host_async"):
                        outs[k].copy_to_host_async()
        hdr = FrameHeader(
            width=self.w, height=self.h, is_keyframe=False,
            error_resilient=self.er, base_qindex=qidx,
            tx_mode=TxMode.ALLOW_32X32,
            refresh_frame_mask=0x03 if refresh_gold else 0x01,
            ref_dpb_index=(0, 1, 1) if self.golden else (0, 0, 0),
            reset_frame_context=0,
            refresh_frame_context=not self.er,
            frame_parallel_decoding_mode=self.fpdm)
        hdr.loop_filter.filter_level = lf_lvl
        if self.golden:
            # the device loop filter applies one level frame-wide; the
            # spec's default ref deltas would lower GOLDEN blocks by one
            # scale step, so they are switched off for device P frames
            # (per-frame header field; keyframes keep spec defaults)
            hdr.loop_filter.mode_ref_delta_enabled = False
        # serialize the *previous* frame while this one runs on device:
        # its device->host transfer happens here on the MAIN thread
        # (the blob copy was enqueued before this frame's step, so it
        # doesn't wait on it), overlapping the worker's serialization
        # of frame N-2; then the pure-host serialization is handed to
        # the worker and the N-2 result collected.
        if self._pending is not None:
            pf, pidx, phdr, pouts, pq = self._pending
            from tpu_vp9.utils.trace import span

            with span("rt_d2h_transfer"):
                phost = _device_out_to_host(pouts, g, self.want_recon)
            if self._ser_async:
                self._drain_futs(out)

                def task(args=(pf, pidx, phdr, phost, pq)):
                    ef = self._finish_host(*args)
                    return ef, self._fc[0]

                self._futs.append(self._ser_pool.submit(task))
            else:
                out.append(self._finish_host(pf, pidx, phdr, phost, pq))
        self._pending = (frame, idx, hdr, outs, qidx)
        return out

    def flush(self):
        """Drain the pipelined frame at end of stream."""
        out = []
        self._drain_futs(out)
        if self._pending is not None:
            out.append(self._finish(*self._pending))
            self._pending = None
        return out

    def measure_step_fps(self, frame, iters: int = 20,
                         qindex: int = 160) -> float:
        """Raw device-step throughput (recon/DPB chain on device, no
        host serialization).  Uses the session's own step/reference/rate
        state so it always matches the compiled signature.  Must be
        called on a session that already encoded at least one keyframe
        (self._refs present)."""
        import time

        import jax
        import jax.numpy as jnp

        from tpu_vp9.ops.loopfilter import pick_filter_level

        assert self._refs is not None, "send a keyframe first"
        g = self.g
        src_y = jnp.asarray(pad_plane(np.asarray(frame.y), g.pad_h,
                                      g.pad_w))
        src_u = jnp.asarray(pad_plane(np.asarray(frame.u), g.pad_h // 2,
                                      g.pad_w // 2))
        src_v = jnp.asarray(pad_plane(np.asarray(frame.v), g.pad_h // 2,
                                      g.pad_w // 2))
        lf_lvl = pick_filter_level(qindex, False) if self.loop_filter else 0
        dc_q = jnp.asarray(T.dc_quant(qindex), jnp.int32)
        ac_q = jnp.asarray(T.ac_quant(qindex), jnp.int32)
        lam = jnp.asarray(max(1, (T.ac_quant(qindex) ** 2) >> 6), jnp.int32)
        lf_args = (jnp.asarray(lf_lvl, jnp.int32),
                   jnp.asarray(int(self._lim_tbl[lf_lvl]), jnp.int32),
                   jnp.asarray(int(self._mblim_tbl[lf_lvl]), jnp.int32))
        refs = tuple(jnp.copy(p) for p in self._refs)
        pm32 = jnp.zeros_like(self._prev_mv32)
        pm16 = jnp.zeros_like(self._prev_mv16)

        def one(refs_in):
            if self.golden:
                return self._step(src_y, src_u, src_v, *refs_in,
                                  *self._gold, pm32, pm16, dc_q, ac_q,
                                  lam, *lf_args, *self._rate_args(qindex))
            return self._step(src_y, src_u, src_v, *refs_in, pm32, pm16,
                              dc_q, ac_q, lam, *lf_args)

        outs, refs = one(refs)
        _ = np.asarray(outs["m32"]["rate"])  # true sync (axon
        # block_until_ready can return before remote completion)
        t0 = time.perf_counter()
        for _ in range(iters):
            outs, refs = one(refs)
        _ = np.asarray(outs["m32"]["rate"])
        return iters / (time.perf_counter() - t0)


def encode_stream_rt(frames, qindex: int = 100, intra_period: int = -1,
                     want_recon: bool = True, rc=None,
                     error_resilient: bool = False,
                     split16: bool = False, golden: bool = False,
                     golden_interval: int = 8):
    """Device-resident realtime encode of an IPPP stream (batch wrapper
    over RtSession).

    frames: list of Frame420.  Returns list[EncodedFrame].  rc: optional
    RateControlState — per-frame qindex override (CQP when None).
    """
    first = frames[0]
    h, w = first.y.shape
    sess = RtSession(w, h, intra_period=intra_period, rc=rc,
                     error_resilient=error_resilient,
                     want_recon=want_recon, split16=split16,
                     golden=golden, golden_interval=golden_interval)
    out = []
    for frame in frames:
        out.extend(sess.send(frame, qindex=qindex))
    out.extend(sess.flush())
    return out
