"""GOP-parallel encoding: bit-identical to sequential (CQP oracle).

The reference's determinism CI gate ("For the CQP mode, the output bit
stream will not change", svt-vp9_encoder_user_guide.md:126) applied to
our process-parallel GOP chunking.
"""

import numpy as np

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.config import EncoderConfig
from tpu_vp9.pipeline.gop_parallel import encode_gop_parallel
from tpu_vp9.utils.yuv import synthetic_frames


def _sequential(frames, cfg):
    enc = Vp9Encoder()
    enc.set_parameter(cfg)
    enc.init()
    for fr in frames:
        enc.send_picture(fr)
    enc.flush()
    out = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        out.append((p.data, p.pts))
    return out


def _make_frames(n, scene_cut_at=None):
    frames = list(synthetic_frames(96, 80, n, seed=4, motion=True))
    if scene_cut_at is not None:
        rng = np.random.default_rng(99)
        for fr in frames[scene_cut_at:]:
            fr.y[:] = rng.integers(0, 255, fr.y.shape)
    return frames


def test_gop_parallel_bit_identical():
    cfg = EncoderConfig(source_width=96, source_height=80, frame_rate=30,
                        qp=45, enc_mode=8, intra_period=7).derive()
    frames = _make_frames(20)
    seq = _sequential(frames, cfg)
    par = encode_gop_parallel(frames, cfg, workers=2)
    assert len(par) == len(seq)
    for (sd, sp), (pd, pp, _dts, _k, _q) in zip(seq, par):
        assert sp == pp
        assert sd == pd, f"packet {sp} differs"


def test_gop_parallel_with_scene_cut_mid_chunk():
    """A scene cut inside a chunk: SCD warmup keeps parity."""
    cfg = EncoderConfig(source_width=96, source_height=80, frame_rate=30,
                        qp=45, enc_mode=8, intra_period=7).derive()
    frames = _make_frames(20, scene_cut_at=11)
    seq = _sequential(frames, cfg)
    par = encode_gop_parallel(frames, cfg, workers=2)
    assert [p[0] for p in par] == [p[0] for p in seq]


def test_gop_parallel_with_scene_cut_at_chunk_boundary():
    """A cut exactly at a GOP boundary: the boundary frame is SCD-warmed
    (sequential runs SCD on scheduled keys too), so parity holds."""
    cfg = EncoderConfig(source_width=96, source_height=80, frame_rate=30,
                        qp=45, enc_mode=8, intra_period=7).derive()
    frames = _make_frames(20, scene_cut_at=8)
    seq = _sequential(frames, cfg)
    par = encode_gop_parallel(frames, cfg, workers=2)
    assert [p[1] for p in par] == [p[1] for p in seq]  # pts
    assert [p[0] for p in par] == [p[0] for p in seq]  # bytes


def test_gop_parallel_rejects_speed_control():
    import pytest

    cfg = EncoderConfig(source_width=96, source_height=80, frame_rate=30,
                        qp=45, intra_period=7, speed_control=True).derive()
    with pytest.raises(ValueError):
        encode_gop_parallel(_make_frames(4), cfg, workers=2)


def test_gop_parallel_rejects_non_cqp():
    import pytest

    from tpu_vp9.config import RateControlMode

    cfg = EncoderConfig(source_width=96, source_height=80, frame_rate=30,
                        rate_control_mode=RateControlMode.VBR,
                        target_bit_rate=200_000, intra_period=7).derive()
    with pytest.raises(ValueError):
        encode_gop_parallel(_make_frames(4), cfg, workers=2)


def test_gop_parallel_low_delay_bit_identical():
    """LD chunks must reproduce the sequential adaptive-kf staticness
    state at chunk boundaries (the _ld_prev_y warmup)."""
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig, PredStructure
    from tpu_vp9.pipeline.gop_parallel import encode_gop_parallel
    from tpu_vp9.utils.yuv import synthetic_frames

    frames = list(synthetic_frames(128, 96, 12, seed=8, motion=True))
    cfg = EncoderConfig(source_width=128, source_height=96, frame_rate=30,
                        qp=52, enc_mode=8, intra_period=3, tpu_realtime=0,
                        pred_structure=PredStructure.LOW_DELAY_P)
    seq = encode_gop_parallel(frames, cfg, workers=1)
    par = encode_gop_parallel(frames, cfg, workers=2)
    assert [p[0] for p in seq] == [p[0] for p in par]
