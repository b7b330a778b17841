"""Device-resident hierarchical random-access encoder.

The reference's entire shipping surface runs hierarchical RA GOPs
through its hot loop (RPS/ALTREF tables
``EbPictureDecisionProcess.c:943-1096``, EncDec ``EbEncDecProcess.c:5306``).
This is the TPU-native counterpart: the dyadic B-pyramid plan of
``pipeline/gop.py`` (decode order, hidden ALTREF frames, show_existing
trailers, superframes) drives the device P-frame step of
``pipeline/tpu_encdec.py`` with a multi-slot DPB whose reference planes
never leave HBM.  Every interior frame motion-searches BOTH its nearer
past anchor (LAST) and its future anchor (ALTREF — full hierarchical
search, opposite sign bias) and may also anchor on the long-term GOLDEN,
with per-block reference selection in device MD.  Serialization rides
the native whole-tile serializer (``serialize_device_frame``) with the
frame-context chain tracked in decode order like a conformant decoder.

CQP per-layer quantizers use the exact libvpx qp-scaling ladder
(``gop.layer_qindex``).
"""

from __future__ import annotations

import numpy as np

from tpu_vp9.bitstream import tables as T
from tpu_vp9.bitstream.headers import (
    FrameHeader, assemble_frame, build_superframe,
)
from tpu_vp9.bitstream.tables import TxMode
from tpu_vp9.pipeline.gop import DpbAllocator, RaPacket, layer_qindex, \
    plan_minigop
from tpu_vp9.pipeline.realtime import (
    RtSession, _device_out_to_host, serialize_device_frame,
)
from tpu_vp9.pipeline.tpu_encdec import make_pframe_step, make_rate_tabs


class DeviceRaSession:
    """Streaming hierarchical-RA encoder on the device EncDec step.

    push() buffers pictures; whole minigops encode once their future
    anchor arrives (the reference's ~1.25 s input buffering,
    ``EbEncHandle.c:1892``).  Packets come out in decode order with
    superframe/show_existing packetization, pts = poc.
    """

    def __init__(self, width: int, height: int, *, gop_len: int = 8,
                 intra_period: int = -1, base_qindex: int = 100,
                 tune: int = 1, want_recon: bool = False):
        assert gop_len >= 1 and (gop_len & (gop_len - 1)) == 0
        self.w, self.h = width, height
        self.gop_len = gop_len
        self.intra_period = intra_period
        self.base_qindex = base_qindex
        self.tune = tune
        # keyframe machinery (device wavefront + serializer) rides a
        # private RtSession; its fc/prev state is ignored afterwards
        self._rt = RtSession(width, height, want_recon=want_recon)
        self.g = self._rt.g
        self._lim_tbl = self._rt._lim_tbl
        self._mblim_tbl = self._rt._mblim_tbl
        self.dpb = DpbAllocator()
        self.planes_of = {}   # poc -> (y, u, v) device, border-extended
        self.mv_of = {}       # poc -> (B32, 2) device MVs (search seeds)
        self.fc = [T.default_frame_context() for _ in range(4)]
        self._prev = None     # (snapshot, shown, dims, intra)
        self.golden_poc = -1
        self.base_poc = -1
        self._buf = {}        # poc -> Frame420
        self._next_poc = 0
        self._since_key = 0
        self._steps = {}

    # -- device step variants -------------------------------------------

    def _step_for(self, golden: bool, altref: bool):
        key = (golden, altref)
        if key not in self._steps:
            self._steps[key] = make_pframe_step(
                self.g, split16=not self.g.strip, golden=golden,
                blob_recon=False, altref=altref, with_rates=True,
                descend_frac=1)
        return self._steps[key]

    # -- streaming API ---------------------------------------------------

    def push(self, frame):
        """Feed one picture (display order); returns ready RaPackets."""
        out = []
        poc = self._next_poc
        self._next_poc += 1
        is_key = poc == 0 or (
            self.intra_period >= 0
            and self._since_key > self.intra_period)
        if is_key:
            # hold the key one frame: the adaptive keyframe quantizer
            # needs the FOLLOWING picture's zz-staticness (the host RA
            # path's QP_SCALING_MODE_1 hold, api._ra_drain)
            self._pending_key = (frame, poc)
            self._since_key = 1
            return out
        self._since_key += 1
        if getattr(self, "_pending_key", None) is not None:
            out.extend(self._encode_pending_key(next_frame=frame))
        self._buf[poc] = frame
        top = self.base_poc + self.gop_len
        if poc == top:
            out.extend(self._encode_minigop())
        return out

    def _encode_pending_key(self, next_frame=None):
        kf, kpoc = self._pending_key
        self._pending_key = None
        staticness = None
        if next_frame is not None:
            from tpu_vp9.pipeline.rc_curves import zz_staticness

            staticness = zz_staticness(kf.y, next_frame.y, self.w, self.h)
        return self._encode_key(kf, kpoc, staticness=staticness)

    def flush(self):
        """Encode any buffered tail as a shortened (low-delay) run."""
        out = []
        if getattr(self, "_pending_key", None) is not None:
            out.extend(self._encode_pending_key())
        while self._buf:
            # encode remaining frames as gop_len-1 chains (pure P)
            pocs = sorted(self._buf)
            n = 1
            out.extend(self._encode_minigop(gop_len=n))
            if sorted(self._buf) == pocs:
                break
        return out

    # -- keyframe --------------------------------------------------------

    def _encode_key(self, frame, poc: int, staticness=None):
        from tpu_vp9.pipeline import rc_curves as C

        rt = self._rt
        # keyframe quantizer rides the I-slice qp-scaling curves of the
        # host RA path (_cqp_qindex is_key / adaptive kf qindex)
        if staticness is not None:
            qidx = C.adaptive_kf_qindex(self.base_qindex, staticness[0],
                                        staticness[1], self.w, self.h)
        else:
            qidx = C.qp_scaling_qindex(self.base_qindex, True, 0,
                                       tune=self.tune, five_level=False)
        ef = rt._encode_key(frame, poc, qidx)
        self.fc = rt._fc
        self.dpb.slot_of.clear()
        self.dpb.free = list(range(8))
        self.planes_of.clear()
        self.mv_of.clear()
        slot = self.dpb.allocate(poc)
        assert slot == 0
        self.planes_of[poc] = rt._refs
        self.base_poc = poc
        self.golden_poc = poc
        self._prev = None
        return [RaPacket(data=ef.payload, pts=poc, dts=poc,
                         is_keyframe=True, qindex=qidx,
                         temporal_layer=0)]

    # -- minigop ---------------------------------------------------------

    def _encode_minigop(self, gop_len: int = None):
        import jax.numpy as jnp

        gop_len = gop_len or self.gop_len
        base_poc = self.base_poc
        n_layers = max(1, gop_len.bit_length())
        plan = plan_minigop(base_poc, gop_len, self.golden_poc)
        needed = {base_poc, self.golden_poc}
        for gf in plan:
            needed |= {gf.last_poc, gf.golden_poc, gf.alt_poc, gf.poc}
        self.dpb.retain_only(needed)
        for p in list(self.planes_of):
            if p not in self.dpb.slot_of:
                self.planes_of.pop(p, None)
                self.mv_of.pop(p, None)
        last_use = {}
        for i, gf in enumerate(plan):
            for p in (gf.last_poc, gf.golden_poc, gf.alt_poc,
                      gf.show_existing_poc):
                if p >= 0:
                    last_use[p] = i
        packets = []
        hidden = []
        for i, gf in enumerate(plan):
            if gf.show_existing_poc >= 0:
                hdr = FrameHeader(
                    show_existing_frame=True,
                    show_existing_frame_index=self.dpb.slot(
                        gf.show_existing_poc))
                packets.append(RaPacket(
                    data=assemble_frame(hdr, b""), pts=gf.poc, dts=gf.poc,
                    is_keyframe=False, qindex=0,
                    temporal_layer=gf.temporal_layer))
                assert not hidden
            else:
                payload, qidx = self._encode_frame(gf, n_layers)
                if gf.show:
                    packets.append(RaPacket(
                        data=build_superframe(hidden + [payload]),
                        pts=gf.poc, dts=gf.poc, is_keyframe=False,
                        qindex=qidx, temporal_layer=gf.temporal_layer))
                    hidden = []
                else:
                    hidden.append(payload)
                self._buf.pop(gf.poc, None)
            for p in [p for p, li in last_use.items() if li == i]:
                if p != base_poc + gop_len and p != self.golden_poc:
                    self.dpb.release(p)
                    self.planes_of.pop(p, None)
                    self.mv_of.pop(p, None)
        assert not hidden
        self.base_poc = base_poc + gop_len
        if self.base_poc - self.golden_poc >= max(2 * gop_len, 8):
            old_g = self.golden_poc
            self.golden_poc = self.base_poc
            if old_g != self.base_poc and old_g in self.dpb.slot_of:
                self.dpb.release(old_g)
                self.planes_of.pop(old_g, None)
                self.mv_of.pop(old_g, None)
        return packets

    def _encode_frame(self, gf, n_layers: int):
        import jax.numpy as jnp

        from tpu_vp9.ops.loopfilter import pick_filter_level

        g = self.g
        frame = self._buf[gf.poc]
        qidx = layer_qindex(self.base_qindex, gf.temporal_layer,
                            n_layers, tune=self.tune)
        refs = self.planes_of[gf.last_poc]
        golden = (self.planes_of.get(gf.golden_poc)
                  if gf.golden_poc >= 0 and gf.golden_poc != gf.last_poc
                  else None)
        alt = (self.planes_of.get(gf.alt_poc)
               if gf.alt_poc >= 0 else None)
        sign_bias = ((0, 0, 0, 1) if alt is not None
                     and gf.alt_poc > gf.poc else (0, 0, 0, 0))
        step = self._step_for(golden is not None, alt is not None)
        src = self._rt.stage(frame)
        qidx = int(qidx)
        dc_q = jnp.asarray(T.dc_quant(qidx), jnp.int32)
        ac_q = jnp.asarray(T.ac_quant(qidx), jnp.int32)
        lam = jnp.asarray(max(1, (T.ac_quant(qidx) ** 2) >> 6), jnp.int32)
        lf_lvl = pick_filter_level(qidx, False)
        lf = (jnp.asarray(lf_lvl, jnp.int32),
              jnp.asarray(int(self._lim_tbl[lf_lvl]), jnp.int32),
              jnp.asarray(int(self._mblim_tbl[lf_lvl]), jnp.int32))
        t = make_rate_tabs(self.fc[0], qidx)
        rate_args = (jnp.asarray(t["mode_cost"]),
                     jnp.asarray(t["joint_cost"]),
                     jnp.asarray(t["nmv_row"]), jnp.asarray(t["nmv_col"]),
                     jnp.asarray(t["ref_cost"]),
                     jnp.asarray(t["lam_bits"]))
        prev_mv = self.mv_of.get(
            gf.last_poc, jnp.zeros((g.n_blocks32, 2), jnp.int32))
        prev16 = jnp.zeros((g.cols16 if g.strip else 1, 2), jnp.int32)
        args = [*src, *(jnp.copy(p) for p in refs)]
        if golden is not None:
            args += list(golden)
        if alt is not None:
            args += list(alt)
        args += [prev_mv, prev16, dc_q, ac_q, lam, *lf, *rate_args]
        outs, new_refs = step(*args)
        host = _device_out_to_host(outs, g, False)
        # header: DPB wiring like gop.RaEncoder._encode_inter_frame
        last_slot = self.dpb.slot(gf.last_poc)
        golden_slot = (self.dpb.slot(gf.golden_poc)
                       if gf.golden_poc in self.dpb.slot_of
                       else last_slot)
        alt_slot = (self.dpb.slot(gf.alt_poc)
                    if gf.alt_poc in self.dpb.slot_of else last_slot)
        refresh_mask = 0
        if gf.is_ref:
            slot = self.dpb.allocate(gf.poc)
            refresh_mask = 1 << slot
        hdr = FrameHeader(
            width=self.w, height=self.h, is_keyframe=False,
            show_frame=gf.show, error_resilient=False,
            base_qindex=qidx, tx_mode=TxMode.ALLOW_32X32,
            refresh_frame_mask=refresh_mask,
            ref_dpb_index=(last_slot, golden_slot, alt_slot),
            ref_sign_bias=tuple(sign_bias[1:]),
            reset_frame_context=0,
            refresh_frame_context=gf.is_ref,
            frame_parallel_decoding_mode=False)
        hdr.loop_filter.filter_level = lf_lvl
        hdr.loop_filter.mode_ref_delta_enabled = False
        prev_mvs = None
        if self._prev is not None:
            snap, shown, dims, intra = self._prev
            if shown and not intra and dims == (self.w, self.h):
                prev_mvs = snap
        fc0 = self.fc[0].copy()
        r = serialize_device_frame(g, host, hdr, fc0, False, prev_mvs,
                                   sign_bias=sign_bias)
        if r is None:
            raise RuntimeError("native serializer unavailable for RA")
        payload, fields, counts, fc_final = r
        # decode-order state updates
        from tpu_vp9.codec.adapt import adapt_frame_context

        if hdr.refresh_frame_context:
            st_counts = counts
            self.fc[0] = adapt_frame_context(
                fc0, st_counts, is_key=False,
                after_key=self._prev is None,
                tx_select=False, final_fc=fc_final)
        snap = (fields[1].copy(), fields[2].copy(), fields[4].copy(),
                fields[5].copy())
        self._prev = (snap, hdr.show_frame, (self.w, self.h), False)
        if gf.is_ref:
            self.planes_of[gf.poc] = new_refs
            import jax.numpy as jnp2

            self.mv_of[gf.poc] = outs["m32"]["mv"].astype(jnp2.int32)
        return payload, qidx
