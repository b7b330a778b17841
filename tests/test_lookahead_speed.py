"""Lookahead (initial-RC) window + speed-control preset switching."""

import numpy as np

from tpu_vp9.pipeline.lookahead import LookaheadWindow, frame_complexity
from tpu_vp9.pipeline.speed_control import SpeedControl


def test_frame_complexity_still_vs_motion():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    assert frame_complexity(a, a) == 0.0
    b = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    assert frame_complexity(b, a) > 10.0
    assert frame_complexity(a, None) > 0.0  # intra-like measure


def test_lookahead_scales_rank_by_complexity():
    rng = np.random.default_rng(1)
    la = LookaheadWindow(distance=9)
    base = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    la.push(0, base)
    # complexity is measured vs the previously pushed source frame:
    # poc 1 still, poc 2 mild change, poc 3 heavy motion
    la.push(1, base.copy())
    mild = base.copy()
    mild[::4] ^= 7
    la.push(2, mild)
    la.push(3, rng.integers(0, 256, (64, 64)).astype(np.uint8))
    s = la.scales([1, 2, 3])
    assert s[1] < s[2] < s[3]
    assert 0.5 <= min(s.values()) and max(s.values()) <= 2.0
    la.drop([1, 2, 3])
    assert la.scales([1]) == {}


def test_lookahead_feeds_rc_targets():
    from tpu_vp9.config import EncoderConfig, RateControlMode
    from tpu_vp9.pipeline.rate_control import RateControlState

    cfg = EncoderConfig(source_width=352, source_height=288, frame_rate=30,
                        rate_control_mode=RateControlMode.VBR,
                        target_bit_rate=500_000).derive()
    rc = RateControlState.create(cfg)
    rc.set_lookahead_scales({5: 2.0, 6: 0.5})
    q_hard = rc.frame_qindex(False, 0, poc=5)
    q_easy = rc.frame_qindex(False, 0, poc=6)
    # the harder frame gets more bits -> a lower (finer) q
    assert q_hard < q_easy


def test_speed_control_steps_up_and_back():
    sc = SpeedControl(target_fps=30.0, base_mode=4, check_every=4)
    # consistently too slow: 10 fps achieved -> mode must rise
    changed = []
    for _ in range(16):
        m = sc.report(1, 0.1)
        if m is not None:
            changed.append(m)
    assert changed and changed[-1] > 4
    assert sc.mode <= 9
    # now very fast: mode steps back toward the configured preset
    for _ in range(64):
        sc.report(1, 0.001)
    assert sc.mode == 4
    # never dips below the quality floor
    for _ in range(32):
        sc.report(1, 0.0001)
    assert sc.mode == 4


def test_speed_control_end_to_end_smoke():
    """speed_control=True runs and produces a decodable stream."""
    import io

    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.bitstream.ivf import write_ivf_frame, write_ivf_header
    from tpu_vp9.config import EncoderConfig
    from tpu_vp9.decoder.decoder import decode_ivf
    from tpu_vp9.utils.yuv import synthetic_frames

    frames = list(synthetic_frames(128, 96, 6, seed=2, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=128, source_height=96,
                                    frame_rate=30, qp=40, enc_mode=6,
                                    intra_period=-1, speed_control=True))
    enc.init()
    for fr in frames:
        enc.send_picture(fr)
    enc.flush()
    data = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        data.append(p.data)
    assert len(data) == len(frames)
    buf = io.BytesIO()
    write_ivf_header(buf, 128, 96, 30, 1, len(data))
    for i, payload in enumerate(data):
        write_ivf_frame(buf, payload, i)
    buf.seek(0)
    n = sum(1 for _ in decode_ivf(buf))
    assert n == len(frames)


def test_trace_spans_accumulate():
    from tpu_vp9.utils import trace

    trace.reset()
    trace.enable(True)
    try:
        with trace.span("stage_a"):
            pass
        with trace.span("stage_a"):
            pass
        with trace.span("stage_b"):
            pass
        s = trace.summary()
        assert s["stage_a"]["count"] == 2
        assert s["stage_b"]["count"] == 1
        assert s["stage_a"]["total_s"] >= 0
    finally:
        trace.enable(False)
        trace.reset()


def test_cli_trace_flag(tmp_path):
    import io
    import subprocess
    import sys

    from tpu_vp9.utils import yuv

    frames = list(yuv.synthetic_frames(64, 64, 3, seed=1, motion=True))
    clip = tmp_path / "t.y4m"
    with open(clip, "wb") as fh:
        yuv.write_y4m(fh, frames)
    out = tmp_path / "t.ivf"
    r = subprocess.run(
        [sys.executable, "-m", "tpu_vp9.app", "-i", str(clip), "-b",
         str(out), "-q", "40", "-enc-mode", "9", "-trace", "1"],
        capture_output=True, text=True, timeout=240,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "TRACE:" in r.stdout
    assert "mode_decision" in r.stdout or "serialize" in r.stdout
