"""Public encoder API — the reference's 7-step lifecycle, Pythonic.

Mirrors ``Source/API/EbSvtVp9Enc.h``:
  eb_vp9_svt_init_handle        -> Vp9Encoder()
  eb_vp9_svt_enc_set_parameter  -> .set_parameter(cfg)
  eb_vp9_init_encoder           -> .init()
  eb_vp9_svt_enc_send_picture   -> .send_picture(frame) / .flush()
  eb_vp9_svt_get_packet         -> .get_packet()
  eb_vp9_svt_release_out_buffer -> (packets are plain bytes; GC handles it)
  eb_vp9_svt_get_recon          -> .get_recon()
  eb_vp9_deinit_encoder/handle  -> .close() / context manager

The streaming surface accepts pictures one at a time and emits packets as
soon as they are ready (1-frame latency in the current low-delay mode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from tpu_vp9.bitstream.headers import FrameHeader, assemble_frame
from tpu_vp9.bitstream.tables import TxMode
from tpu_vp9.codec.intra_frame import encode_keyframe
from tpu_vp9.codec.inter_frame import encode_pframe
from tpu_vp9.config import EncoderConfig
from tpu_vp9.pipeline.encoder import _make_refs
from tpu_vp9.pipeline.presets import derive_signals
from tpu_vp9.pipeline.rate_control import RateControlState
from tpu_vp9.utils.yuv import Frame420


@dataclass
class Packet:
    data: bytes
    pts: int
    dts: int
    is_keyframe: bool
    qindex: int


class Vp9Encoder:
    """Streaming VP9 encoder handle."""

    def __init__(self) -> None:
        self._cfg: Optional[EncoderConfig] = None
        self._initialized = False
        self._rc = None
        self._sig = None
        self._refs = None
        self._golden_refs = None
        self._since_golden = 0
        self.golden_interval = 8
        self._scd = None
        self._fc_state = None  # 4 persistent frame contexts (non-ER)
        self._last_key_idx = 0
        self._base_refs = None
        self._base_snapshot = None
        self._last_was_inter = False
        self._prev_snapshot = None  # (ref0, mv) grids of the last frame
        self._frame_idx = 0
        self._decode_order = 0  # packets emitted so far (decode order)
        self._dts_offset = 0  # DTS = decode_order - 2^hier + 1 (RA)
        self._packets: list = []
        self._last_recon = None
        self._eos = False
        self._last_was_droppable = False
        self._qp_overrides: dict = {}

    # -- lifecycle ---------------------------------------------------------
    def set_parameter(self, cfg: EncoderConfig) -> None:
        cfg = cfg.derive()
        cfg.validate()
        self._cfg = cfg

    def init(self) -> None:
        if self._cfg is None:
            raise RuntimeError("set_parameter must be called before init")
        # warm the one-time intra predictor tables (dir_maps /
        # all_modes_matrix are functools.cached per block size) so the
        # first keyframe doesn't pay table construction at stream time —
        # eb_vp9_init_encoder builds its ep-block stats up front too
        # (EbEncHandle.c:808)
        from tpu_vp9.ops import intra as _intra_ops

        for _bs in (4, 8, 16, 32):
            _intra_ops.dir_maps(_bs)
        _intra_ops.all_modes_matrix(32)
        self._sig = derive_signals(self._cfg)
        from tpu_vp9.pipeline.picture_decision import SceneChangeDetector

        self._scd = SceneChangeDetector()
        self._tpu_ok = True
        if self._sig.use_tpu_me:
            from dataclasses import replace

            from tpu_vp9.utils.device import tpu_alive, tpu_dead_reason
            from tpu_vp9.utils.trace import notice

            if not tpu_alive():
                # wedged/absent accelerator: host ME fallback.  use_tpu_hints
                # stays on — open-loop mode decision has a fast numpy
                # fallback (openloop_mode_hints_np) feeding the wavefront.
                self._sig = replace(self._sig, use_tpu_me=False)
                self._tpu_ok = False
                notice(f"TPU unavailable ({tpu_dead_reason()}); "
                       "falling back to host motion estimation")
        self._rc = RateControlState.create(self._cfg)
        # real VP9 tile columns (the scale-out unit the reference forces
        # to 1): tpu_tile_columns > 1 requests that many, clamped to the
        # spec limits for this width (tile_log2_limits)
        from tpu_vp9.bitstream.headers import tile_log2_limits

        mi_cols = (self._cfg.source_width + 7) >> 3
        lo, hi = tile_log2_limits(mi_cols)
        want = self._cfg.tpu_tile_columns
        if want is not None and want > 1:
            log2 = int(want - 1).bit_length()  # ceil(log2(want))
        else:
            log2 = 0  # auto (-1) / single-tile (0/1)
        # lo is the spec-mandatory minimum (wide frames MUST tile)
        self._log2_tile_cols = min(max(log2, lo), hi)
        # random-access hierarchical (ALTREF-pyramid) engine
        self._ra = None
        from tpu_vp9.config import PredStructure

        if (self._cfg.pred_structure == PredStructure.RANDOM_ACCESS
                and self._cfg.hierarchical_levels >= 1):
            from tpu_vp9.pipeline.gop import RaEncoder

            self._ra = RaEncoder(self._cfg, self._sig, self._rc)
            self._ra.log2_tile_cols = self._log2_tile_cols
            # packetization latency contract: DTS = decode_order -
            # 2^hier + 1 (EbPacketizationProcess.c:360-361)
            self._dts_offset = -(1 << self._cfg.hierarchical_levels) + 1
            self._ra_buf = {}
            self._ra_keys = set()
            # initial-RC lookahead window (look_ahead_distance analogue:
            # (2 << hier) + 1 for CQP, else up to one intra period)
            from tpu_vp9.config import RateControlMode
            from tpu_vp9.pipeline.lookahead import LookaheadWindow

            dist = (2 << self._cfg.hierarchical_levels) + 1
            if (self._cfg.rate_control_mode != RateControlMode.CQP
                    and self._cfg.intra_period > 0):
                dist = max(dist, min(self._cfg.intra_period, 64))
            self._la = LookaheadWindow(dist)
        self._sc = None
        if self._cfg.speed_control:
            from tpu_vp9.pipeline.speed_control import SpeedControl

            self._sc = SpeedControl(target_fps=max(self._cfg.fps, 1.0),
                                    base_mode=self._cfg.enc_mode)
        # device-resident realtime EncDec loop (the reference's hot loop,
        # EbEncDecProcess.c:5306, as one jitted device step): low-delay
        # M8/M9 streams route through it when the geometry fits the
        # uniform device grid and an accelerator is reachable
        self._rt = None
        self._ra_dev = None
        cfg = self._cfg
        if (self._ra is not None and cfg.tpu_realtime != 0
                and int(cfg.enc_mode) >= 8 and not cfg.tpu_mesh_shape
                and cfg.recon_file is None and self._sc is None
                and not self._qp_overrides):
            from tpu_vp9.config import RateControlMode

            if (cfg.rate_control_mode == RateControlMode.CQP
                    and (self._tpu_ok or cfg.tpu_realtime in (1, 2))):
                from tpu_vp9.pipeline.presets import qp_to_qindex
                from tpu_vp9.pipeline.ra_device import DeviceRaSession
                from tpu_vp9.utils.trace import notice

                try:
                    self._ra_dev = DeviceRaSession(
                        cfg.source_width, cfg.source_height,
                        gop_len=1 << cfg.hierarchical_levels,
                        intra_period=cfg.intra_period,
                        base_qindex=qp_to_qindex(cfg.qp),
                        tune=int(cfg.tune))
                    notice("random-access pyramids on the device "
                           "EncDec step (DeviceRaSession)")
                except ValueError as exc:
                    self._ra_dev = None
                    notice("device RA session unavailable "
                           f"({exc}); host RA engine")
        if (self._ra is None and cfg.tpu_realtime != 0
                and int(cfg.enc_mode) >= 8):
            from tpu_vp9.utils.device import tpu_dead_reason
            from tpu_vp9.utils.trace import notice

            if cfg.tpu_realtime == 1 and not self._tpu_ok:
                # explicit -rt 1 must not silently degrade to a ~0.5 fps
                # host encode (reference: error packet on the output FIFO,
                # EbEncHandle.c:437-452); -rt 2 forces a CPU-jax session
                # for hermetic testing
                raise RuntimeError(
                    "tpu_realtime=1 requested but no live accelerator: "
                    f"{tpu_dead_reason()}")
            if self._tpu_ok or cfg.tpu_realtime in (1, 2):
                from tpu_vp9.config import RateControlMode
                from tpu_vp9.pipeline.realtime import RtSession

                rt_rc = (self._rc
                         if cfg.rate_control_mode != RateControlMode.CQP
                         else None)
                try:
                    self._rt = RtSession(
                        cfg.source_width, cfg.source_height,
                        intra_period=cfg.intra_period,
                        error_resilient=cfg.error_resilient,
                        frame_parallel_decoding=cfg.frame_parallel_decoding,
                        want_recon=cfg.recon_file is not None,
                        loop_filter=cfg.loop_filter,
                        # VBR/CBR: per-frame q + post-encode feedback ride
                        # the shared controller (EbRateControlProcess ports)
                        rc=rt_rc,
                        # M8 runs the 32-vs-16 partition decision and the
                        # HBM GOLDEN anchor; M9 keeps the uniform
                        # LAST-only grid (speed ladder)
                        split16=int(cfg.enc_mode) <= 8,
                        golden=(int(cfg.enc_mode) <= 8
                                and not cfg.tpu_mesh_shape),
                        mesh_shape=(tuple(cfg.tpu_mesh_shape)
                                    if cfg.tpu_mesh_shape else None),
                        # tune SQ: per-SB variance-adaptive rate-lambda
                        # (QPM analogue) in device MD
                        aq=int(cfg.tune) == 0)
                except ValueError as exc:
                    if cfg.tpu_realtime == 1:
                        raise RuntimeError(
                            "tpu_realtime=1 requested but the realtime "
                            f"session rejected this geometry: {exc}") from exc
                    self._rt = None  # unsupported geometry: host fallback
                    notice(f"realtime device session unavailable ({exc}); "
                           "falling back to host encode")
        self._initialized = True

    def _speed_report(self, n_frames: int, seconds: float) -> None:
        """Feed the speed controller; re-derive preset signals on change
        (dynamic SCS update in ResourceCoordination)."""
        if self._sc is None:
            return
        new_mode = self._sc.report(n_frames, seconds)
        if new_mode is None:
            return
        from dataclasses import replace

        self._sig = derive_signals(replace(self._cfg, enc_mode=new_mode))
        if self._sig.use_tpu_me and not self._tpu_ok:
            self._sig = replace(self._sig, use_tpu_me=False)
        if getattr(self, "_ra", None) is not None:
            self._ra.sig = self._sig

    def close(self) -> None:
        self._initialized = False
        self._refs = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- data path ---------------------------------------------------------
    def set_frame_qp(self, frame_idx: int, qp: int) -> None:
        """qp-file equivalent (EbAppProcessCmd.c:179)."""
        self._qp_overrides[frame_idx] = qp

    def send_picture(self, frame: Frame420, force_keyframe: bool = False):
        if not self._initialized:
            raise RuntimeError("encoder not initialized")
        if self._eos:
            raise RuntimeError("send_picture after flush")
        cfg, sig, rc = self._cfg, self._sig, self._rc
        idx = self._frame_idx
        self._frame_idx += 1
        if self._sc is not None and self._ra is None:
            import time as _time

            _sc_t0 = _time.perf_counter()
        if self._ra_dev is not None:
            if force_keyframe and idx > 0:
                from tpu_vp9.utils.trace import notice

                notice("device RA session ignores mid-stream keyframe "
                       "requests (scheduled intra period only)")
            for p in self._ra_dev.push(frame):
                self._emit_ra([p])
            return
        if self._ra is not None:
            if force_keyframe:
                self._ra_keys.add(idx)
            elif (self._scd is not None and idx > 0
                  and cfg.intra_period != -1
                  and self._scd.is_scene_change(frame.y)):
                self._ra_keys.add(idx)
            self._ra_buf[idx] = frame
            self._la.push(idx, frame.y)
            if self._sc is not None:
                import time as _time

                n0, t0 = len(self._packets), _time.perf_counter()
                self._ra_drain(flush=False)
                self._speed_report(len(self._packets) - n0,
                                   _time.perf_counter() - t0)
            else:
                self._ra_drain(flush=False)
            return
        is_key = force_keyframe or idx == 0 or (
            cfg.intra_period >= 0 and idx % (cfg.intra_period + 1) == 0)
        # scene-change detection (EbPictureDecisionProcess.c:100 analogue)
        if self._scd is not None:
            cut = self._scd.is_scene_change(frame.y)
            if cut and not is_key and cfg.intra_period != -1:
                is_key = True
        if self._rt is not None:
            if idx in self._qp_overrides:
                from tpu_vp9.pipeline.presets import qp_to_qindex

                qindex = qp_to_qindex(self._qp_overrides[idx])
            else:
                qindex = rc.frame_qindex(
                    is_key,
                    staticness=self._ld_kf_staticness(frame)
                    if is_key else None)
            for ef in self._rt.send(frame, qindex=qindex,
                                    force_keyframe=is_key):
                self._emit_rt(ef)
            self._ld_prev_y = frame.y
            if self._sc is not None:
                self._speed_report(1, _time.perf_counter() - _sc_t0)
            return
        h, w = frame.y.shape
        er = cfg.error_resilient
        # 2-layer low-delay hierarchy: odd frames are non-reference and
        # quantized harder (EbPredictionStructure 2-level analogue); base
        # layer lives in DPB slot 0, GOLDEN anchor in slot 1.
        hierarchical = (cfg.hierarchical_levels >= 1
                        and cfg.pred_structure != 2)
        # phase: the frame right after a key is a BASE frame, so a decoder
        # that drops enhancement frames sees the same last_frame_type
        # sequence as a full decode (backward adaptation's after-key
        # factor depends on it)
        is_nonref = (hierarchical and not is_key
                     and (idx - self._last_key_idx) % 2 == 0)
        if is_key:
            self._last_key_idx = idx
        if idx in self._qp_overrides:
            from tpu_vp9.pipeline.presets import qp_to_qindex

            qindex = qp_to_qindex(self._qp_overrides[idx])
        else:
            qindex = rc.frame_qindex(
                is_key,
                staticness=self._ld_kf_staticness(frame)
                if is_key else None)
            # hierarchical qp-scaling (EbRateControlProcess.c:44 analogue):
            # referenced base frames get finer quantization, disposable
            # enhancement frames coarser
            if is_nonref:
                qindex = min(qindex + 20, 255)
            elif hierarchical and not is_key:
                qindex = max(qindex - 12, 0)
        self._ld_prev_y = frame.y
        from tpu_vp9.bitstream import tables as _T

        if self._fc_state is None:
            self._fc_state = [_T.default_frame_context() for _ in range(4)]
        if is_key or er:
            # setup_past_independence: reset all contexts
            self._fc_state = [_T.default_frame_context() for _ in range(4)]
        fc_base = None if er else self._fc_state[0]
        # backward adaptation (fpdm=0) is the default for non-ER streams
        # (libvpx coding model); droppable frames must not refresh the
        # context so decoders can skip them safely
        fpdm = er or cfg.frame_parallel_decoding
        after_key = (not is_key) and not self._last_was_inter
        if is_key:
            tile, st = encode_keyframe(frame, qindex, sig.block_size,
                                       qbias=sig.qbias, fc_base=fc_base,
                                       open_loop_md=sig.use_tpu_hints,
                                       part_depths=sig.part_depths,
                                       log2_tile_cols=self._log2_tile_cols)
            hdr = FrameHeader(width=w, height=h, is_keyframe=True,
                              error_resilient=er, base_qindex=qindex,
                              tx_mode=TxMode.ALLOW_32X32,
                              refresh_frame_context=not er,
                              frame_parallel_decoding_mode=fpdm,
                              frame_context_idx=0,
                              log2_tile_cols=self._log2_tile_cols)
        else:
            refresh_golden = (self._since_golden >= self.golden_interval
                              and not is_nonref)
            restrict = (not er) and self._last_was_inter
            # a frame following a DROPPABLE frame must not rely on its MV
            # snapshot (decoders may have skipped it); the restriction
            # machinery keeps candidates invariant to any temporal-MV
            # state instead
            prev_usable = restrict and not self._last_was_droppable
            lmap = None
            if sig.qpm or sig.denoise:
                from tpu_vp9.pipeline.picture_analysis import (
                    analyze_picture,
                )

                stats = analyze_picture(frame, denoise=sig.denoise)
                if sig.qpm:
                    lmap = stats.sb_lambda_map()
            tile, st = encode_pframe(
                frame, self._refs, qindex, sig.block_size,
                sig.search_range, qbias=sig.qbias, do_subpel=sig.do_subpel,
                adaptive_partition=sig.adaptive_partition,
                adp_budget=sig.adp_budget,
                golden_refs=self._golden_refs, tx_select=sig.tx_select,
                use_tpu_me=sig.use_tpu_me, fc_base=fc_base,
                restrict_mv_modes=restrict,
                prev_mvs=(self._prev_snapshot
                          if prev_usable else None),
                part_depths=sig.part_depths, lambda_map=lmap,
                log2_tile_cols=self._log2_tile_cols)
            hdr = FrameHeader(width=w, height=h, is_keyframe=False,
                              error_resilient=er, base_qindex=qindex,
                              tx_mode=TxMode.TX_MODE_SELECT if sig.tx_select
                              else TxMode.ALLOW_32X32,
                              refresh_frame_mask=(0 if is_nonref else
                                                  (0b11 if refresh_golden
                                                   else 0b01)),
                              ref_dpb_index=(0, 1, 1),
                              reset_frame_context=0,
                              refresh_frame_context=not er and not is_nonref,
                              frame_parallel_decoding_mode=fpdm,
                              frame_context_idx=0,
                              log2_tile_cols=self._log2_tile_cols)
        from tpu_vp9.pipeline.encoder import _apply_loop_filter

        _apply_loop_filter(st, hdr, qindex, is_key, enabled=cfg.loop_filter)
        payload = assemble_frame(hdr, tile, st.header_updates)
        rc.update(len(payload) * 8, is_key)
        if not er and hdr.refresh_frame_context:
            if fpdm:
                if getattr(st, "fc_final", None) is not None:
                    self._fc_state[0] = st.fc_final
            elif getattr(st, "counts", None) is not None:
                from tpu_vp9.codec.adapt import adapt_frame_context

                self._fc_state[0] = adapt_frame_context(
                    fc_base if fc_base is not None
                    else _T.default_frame_context(),
                    st.counts, is_key=is_key, after_key=after_key,
                    tx_select=hdr.tx_mode == TxMode.TX_MODE_SELECT,
                    final_fc=getattr(st, "fc_final", None))
        self._last_was_inter = not is_key
        self._last_was_droppable = is_nonref
        self._prev_snapshot = st.mig.snapshot_mvs()
        if is_nonref:
            # non-reference frame: DPB slot 0 keeps the previous base
            self._refs = self._base_refs
        else:
            self._refs = _make_refs(st, w, h)
            self._base_refs = self._refs
        if is_key or (hdr.refresh_frame_mask & 0b10):
            self._golden_refs = self._refs
            self._since_golden = 0
        else:
            self._since_golden += 1
        self._last_recon = (
            st.planes[0].recon[:h, :w].copy(),
            st.planes[1].recon[: (h + 1) >> 1, : (w + 1) >> 1].copy(),
            st.planes[2].recon[: (h + 1) >> 1, : (w + 1) >> 1].copy(),
        )
        self._emit(Packet(data=payload, pts=idx, dts=0,
                          is_keyframe=is_key, qindex=qindex))
        if self._sc is not None:
            self._speed_report(1, _time.perf_counter() - _sc_t0)

    def _ld_kf_staticness(self, frame):
        """Keyframe staticness for the low-delay paths: the reference
        measures the NEXT picture's zz-SAD (lookahead >= 1 always); at
        1-frame latency the PREVIOUS picture is the stand-in, and the
        very first keyframe uses a moderate prior — without it the
        plain CQP curve lets high-qp anchors fall off the all-zero
        quantization cliff and every P frame pays for the weak
        reference (QP_SCALING_MODE_1, EbRateControlProcess.c:4592)."""
        prev = getattr(self, "_ld_prev_y", None)
        if prev is None or prev.shape != frame.y.shape:
            return (10, 50)
        from tpu_vp9.pipeline.rc_curves import zz_staticness

        return zz_staticness(frame.y, prev,
                             self._cfg.source_width,
                             self._cfg.source_height)

    def _emit(self, pkt: Packet) -> None:
        """Stamp decode-order DTS and queue the packet
        (EbPacketizationProcess.c:359-361)."""
        pkt.dts = self._decode_order + self._dts_offset
        self._decode_order += 1
        self._packets.append(pkt)

    def _emit_rt(self, ef) -> None:
        """Book-keep one realtime-path EncodedFrame into the packet queue."""
        if self._rt.rc is None:  # session-held RC already got the feedback
            self._rc.update(len(ef.payload) * 8, ef.is_keyframe)
        if self._rt.want_recon:
            st = ef.state
            h, w = self._cfg.source_height, self._cfg.source_width
            self._last_recon = (
                st.planes[0].recon[:h, :w].copy(),
                st.planes[1].recon[: (h + 1) >> 1, : (w + 1) >> 1].copy(),
                st.planes[2].recon[: (h + 1) >> 1, : (w + 1) >> 1].copy(),
            )
        self._emit(Packet(data=ef.payload, pts=ef.pts, dts=0,
                          is_keyframe=ef.is_keyframe, qindex=ef.qindex))

    def _ra_drain(self, flush: bool) -> None:
        """Encode every complete (or flush-truncated) minigop in the buffer.

        Picture-decision analogue for random access: mini-GOP assembly and
        split (EbPictureDecisionProcess.c:367-480) driven by keyframe
        schedule, scene-cut requests, and input availability.
        """
        cfg, ra = self._cfg, self._ra
        max_gop = 1 << cfg.hierarchical_levels
        while True:
            next_poc = ra.base_poc + 1 if ra.base_poc >= 0 else 0
            # next scheduled/requested keyframe at or after next_poc
            key_req = [k for k in self._ra_keys if k >= next_poc]
            next_key = min(key_req) if key_req else None
            if cfg.intra_period >= 0:
                period = cfg.intra_period + 1
                sched = ((next_poc + period - 1) // period) * period
                next_key = sched if next_key is None else min(next_key, sched)
            elif next_poc == 0:
                next_key = 0
            if next_key == next_poc:
                if next_poc not in self._ra_buf:
                    break
                # adaptive keyframe QP needs the following picture's
                # zz-SAD staticness (QP_SCALING_MODE_1; the reference's
                # ME kernel fills the previous pcs's non_moving scores,
                # EbMotionEstimationProcess.c:431): hold the key one
                # frame unless flushing
                from tpu_vp9.config import PredStructure

                nxt = self._ra_buf.get(next_poc + 1)
                if (nxt is None and not flush
                        and cfg.pred_structure == PredStructure.RANDOM_ACCESS):
                    break
                if nxt is None:
                    nxt = getattr(self, "_ra_next_hint", None)
                staticness = None
                if nxt is not None:
                    from tpu_vp9.pipeline.rc_curves import zz_staticness

                    cur = self._ra_buf[next_poc]
                    staticness = zz_staticness(cur.y, nxt.y, cfg.source_width,
                                               cfg.source_height)
                qov = self._qp_overridden(next_poc)
                qindex = qov if qov is not None else \
                    self._rc.frame_qindex(True, staticness=staticness)
                pkt = ra.encode_key(self._ra_buf.pop(next_poc), next_poc,
                                    qindex)
                self._la.drop([next_poc])  # retire its complexity entry
                self._ra_keys.discard(next_poc)
                self._emit_ra([pkt])
                continue
            # minigop span limited by the next keyframe
            span = max_gop if next_key is None else next_key - 1 - ra.base_poc
            if span <= 0:
                break  # key is due but its frame hasn't arrived
            gop = 1
            while gop * 2 <= min(span, max_gop):
                gop *= 2
            avail = 0
            while ra.base_poc + 1 + avail in self._ra_buf:
                avail += 1
            if avail < gop:
                if not flush or avail == 0:
                    break
                gop = 1
                while gop * 2 <= avail:
                    gop *= 2
            frames = {ra.base_poc + 1 + i: self._ra_buf[ra.base_poc + 1 + i]
                      for i in range(gop)}
            qov = self._qp_overridden(ra.base_poc + 1)
            # initial-RC edge: hand the high-level controller this
            # window's relative complexities before QPs are assigned
            self._rc.set_lookahead_scales(self._la.scales(frames))
            pkts = ra.encode_minigop(frames, ra.base_poc, gop,
                                     qindex_override=qov)
            self._la.drop(frames)
            for p in frames:
                del self._ra_buf[p]
            self._emit_ra(pkts)

    def _qp_overridden(self, poc: int):
        if poc in self._qp_overrides:
            from tpu_vp9.pipeline.presets import qp_to_qindex

            return qp_to_qindex(self._qp_overrides[poc])
        return None

    def _emit_ra(self, ra_packets) -> None:
        for p in ra_packets:
            self._emit(Packet(data=p.data, pts=p.pts, dts=0,
                              is_keyframe=p.is_keyframe, qindex=p.qindex))

    def flush(self, next_frame_hint=None) -> None:
        """Signal end of stream (EB_BUFFERFLAG_EOS analogue).

        next_frame_hint: optional picture that WOULD follow this stream
        (GOP-parallel chunk boundaries) — used only for the adaptive
        keyframe-QP staticness measurement so chunked encodes stay
        byte-identical to sequential ones.
        """
        if self._ra_dev is not None and not self._eos:
            for p in self._ra_dev.flush():
                self._emit_ra([p])
        elif self._ra is not None and not self._eos:
            self._ra_next_hint = next_frame_hint
            self._ra_drain(flush=True)
        if self._rt is not None and not self._eos:
            for ef in self._rt.flush():
                self._emit_rt(ef)
        self._eos = True

    def get_packet(self, blocking: bool = False) -> Optional[Packet]:
        if self._packets:
            return self._packets.pop(0)
        return None

    def get_recon(self):
        """Last encoded picture's reconstruction (y, u, v) or None."""
        return self._last_recon

    def get_trace_summary(self) -> dict:
        """Per-stage timing summary when tracing is enabled
        (utils.trace; the observability the reference's commented-out
        segment-trace hooks never shipped)."""
        from tpu_vp9.utils.trace import summary

        return summary()
