"""Rate control: CQP (with keyframe QP scaling), VBR, CBR + VBV.

Capability parity with the reference RC kernel
(``EbRateControlProcess.c``: CQP qp-scaling ``:44``, VBR ``:434/:1067``,
CBR ``:2243``, VBV ``:4378``) — re-expressed as a compact per-frame
controller suitable for frame-parallel operation: all state lives in a
small dataclass that can be psum-merged across shards.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tpu_vp9.config import EncoderConfig, RateControlMode
from tpu_vp9.pipeline.presets import qp_to_qindex


@dataclass
class RateControlState:
    cfg: EncoderConfig
    qindex: int = 100
    target_bits_per_frame: float = 0.0
    buffer_level: float = 0.0  # VBV fullness (bits)
    buffer_size: float = 0.0
    total_bits: float = 0.0
    frames_coded: int = 0
    err_accum: float = 0.0

    @classmethod
    def create(cls, cfg: EncoderConfig) -> "RateControlState":
        st = cls(cfg=cfg)
        st.qindex = qp_to_qindex(cfg.qp)
        if cfg.rate_control_mode != RateControlMode.CQP:
            fps = max(cfg.fps, 1.0)
            st.target_bits_per_frame = cfg.target_bit_rate / fps
            st.buffer_size = cfg.vbv_buf_size or 2 * cfg.target_bit_rate
            st.buffer_level = st.buffer_size * 0.5
            st.qindex = 128  # start mid-range; adapts quickly
        return st

    def frame_qindex(self, is_keyframe: bool) -> int:
        q = self.qindex
        if is_keyframe:
            # keyframe boost (CQP qp-scaling analogue: ~3/4 of inter q)
            q = int(q * 0.72)
        return int(np.clip(q, qp_to_qindex(self.cfg.min_qp_allowed),
                           qp_to_qindex(self.cfg.max_qp_allowed)))

    def update(self, frame_bits: int, is_keyframe: bool) -> None:
        """Post-encode feedback (the packetization->RC edge)."""
        self.total_bits += frame_bits
        self.frames_coded += 1
        if self.cfg.rate_control_mode == RateControlMode.CQP:
            return
        target = self.target_bits_per_frame
        if is_keyframe:
            target = target * 4  # keyframes are allowed a boost budget
        err = frame_bits / max(target, 1.0)
        # multiplicative-increase controller on log bit error
        step = 12.0 if self.cfg.rate_control_mode == RateControlMode.CBR else 8.0
        self.qindex += int(np.clip(step * np.log2(max(err, 1e-3)), -16, 16))
        # long-term drift correction
        avg = self.total_bits / self.frames_coded
        drift = avg / max(self.target_bits_per_frame, 1.0)
        self.qindex += int(np.clip(4.0 * np.log2(max(drift, 1e-3)), -4, 4))
        self.qindex = int(np.clip(self.qindex, 0, 255))
        if self.cfg.rate_control_mode == RateControlMode.CBR:
            # VBV accounting: drain at target rate, fill with frame bits
            self.buffer_level += self.target_bits_per_frame - frame_bits
            self.buffer_level = min(self.buffer_level, self.buffer_size)
            if self.buffer_level < 0.15 * self.buffer_size:
                self.qindex = min(self.qindex + 12, 255)  # emergency
            elif self.buffer_level > 0.85 * self.buffer_size:
                self.qindex = max(self.qindex - 6, 0)
