"""High-level VBR/CBR acceptance: long runs with scene cuts.

Reference behavior contract (EbRateControlProcess.c VBR :434, CBR
:1718/:3722, VBV :4378 + vendored vp9_ratectrl.c one-pass targets):
VBR holds the long-run average near the target; CBR steers toward the
optimal buffer level and never underflows the decoder's VBV buffer.
"""

import numpy as np
import pytest

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.config import EncoderConfig, PredStructure, RateControlMode
from tpu_vp9.utils.yuv import synthetic_frames

FPS = 30.0


def _cut_frames(n):
    """300 frames with scene cuts every 100 (fresh content each cut)."""
    out = []
    for seg in range((n + 99) // 100):
        seg_frames = list(synthetic_frames(96, 80, min(100, n - 100 * seg),
                                           seed=10 + seg, motion=True))
        out.extend(seg_frames)
    return out[:n]


def _encode(cfg, frames):
    enc = Vp9Encoder()
    enc.set_parameter(cfg)
    enc.init()
    sizes = []
    for fr in frames:
        enc.send_picture(fr)
        while True:
            p = enc.get_packet()
            if p is None:
                break
            sizes.append(len(p.data))
    enc.flush()
    while True:
        p = enc.get_packet()
        if p is None:
            break
        sizes.append(len(p.data))
    return sizes, enc


def _cfg(**kw):
    base = dict(source_width=96, source_height=80, frame_rate=30, qp=40,
                enc_mode=9, pred_structure=PredStructure.LOW_DELAY_P,
                hierarchical_levels=0, min_qp_allowed=0, max_qp_allowed=63,
                intra_period=99)
    base.update(kw)
    return EncoderConfig(**base)


def test_vbr_300_frames_with_cuts_within_5pct():
    frames = _cut_frames(300)
    target = 150_000  # bits/s
    sizes, _ = _encode(_cfg(rate_control_mode=RateControlMode.VBR,
                            target_bit_rate=target), frames)
    assert len(sizes) == 300
    rate = sum(sizes) * 8 / (300 / FPS)
    assert abs(rate - target) / target < 0.05, \
        f"VBR rate {rate:.0f} vs target {target} " \
        f"({(rate - target) / target:+.1%})"


def test_cbr_never_violates_vbv():
    frames = _cut_frames(300)
    target = 150_000
    vbv = 2 * target  # 2-second buffer
    sizes, enc = _encode(_cfg(rate_control_mode=RateControlMode.CBR,
                              target_bit_rate=target, vbv_buf_size=vbv),
                         frames)
    assert len(sizes) == 300
    # independent VBV simulation over the emitted packet sizes: buffer
    # fills at channel rate, drains by frame bits, must never underflow
    level = vbv * 0.5
    fill = target / FPS
    for i, s in enumerate(sizes):
        assert s * 8 <= level + 1e-6, \
            f"VBV underflow at frame {i}: {s * 8} bits > {level:.0f}"
        level = min(level + fill - s * 8, vbv)
    assert enc._rc.vbv_violations == 0
    rate = sum(sizes) * 8 / (300 / FPS)
    assert abs(rate - target) / target < 0.10, rate


def test_vbr_layer_targets_sum_to_bandwidth():
    """The per-layer VBR split must conserve total bandwidth."""
    from tpu_vp9.pipeline.rate_control import (
        RATE_PCT_LAYER, RateControlState,
    )

    for hl in range(6):
        cfg = _cfg(rate_control_mode=RateControlMode.VBR,
                   target_bit_rate=300_000,
                   pred_structure=PredStructure.RANDOM_ACCESS,
                   hierarchical_levels=max(hl, 1)).derive()
        rc = RateControlState.create(cfg)
        hl_eff = int(np.clip(cfg.hierarchical_levels, 0, 5))
        gop = 1 << hl_eff
        total = rc._layer_target(0)
        for tl in range(1, hl_eff + 1):
            total += rc._layer_target(tl) * (1 << (tl - 1))
        pct_sum = sum(RATE_PCT_LAYER[hl_eff][: hl_eff + 1])
        expect = rc.target_bits_per_frame * gop * pct_sum / 100.0
        assert abs(total - expect) < 1e-6 * max(expect, 1)
