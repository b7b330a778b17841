"""Adaptive 32->16 partition splitting: conformance + effectiveness."""

import io

import numpy as np

from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.bitstream.tables import BlockSize
from tpu_vp9.codec.inter_frame import encode_pframe
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.pipeline.encoder import encode_stream
from tpu_vp9.utils.yuv import Frame420, synthetic_frames


def make_mixed_motion_frames():
    """Two textured objects moving oppositely INSIDE one 32x32 region on a
    smooth background: 16x16 blocks with separate MVs should win."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:96, 0:128]
    base = (60 + xx // 2).astype(np.uint8)  # smooth gradient
    tex_a = rng.integers(150, 255, (12, 12)).astype(np.uint8)
    tex_b = rng.integers(0, 100, (12, 12)).astype(np.uint8)
    frames = []
    for t in range(3):
        y = base.copy()
        # both movers inside the 32x32 block at (32..64, 32..64)
        ax = 34 + 6 * t
        y[34:46, ax : ax + 12] = tex_a  # top mover: +x
        bx = 50 - 6 * t
        y[50:62, bx : bx + 12] = tex_b  # bottom mover: -x
        u = np.full((48, 64), 120, np.uint8)
        v = np.full((48, 64), 130, np.uint8)
        frames.append(Frame420(y=y, u=u, v=v))
    return frames


def roundtrip(frames, **kw):
    enc = encode_stream(frames, **kw)
    buf = io.BytesIO()
    write_ivf_header(buf, frames[0].width, frames[0].height, 30, 1)
    for i, ef in enumerate(enc):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(enc))
    buf.seek(0)
    return enc, list(decode_ivf(buf))


def test_adaptive_splits_occur_and_decode():
    frames = make_mixed_motion_frames()
    # force adaptive path via direct encode_pframe args
    from tpu_vp9.pipeline.encoder import _make_refs
    from tpu_vp9.codec.intra_frame import encode_keyframe

    _, st0 = encode_keyframe(frames[0], 120)
    refs = _make_refs(st0, 128, 96)
    tile, st = encode_pframe(frames[1], refs, 120,
                             BlockSize.BLOCK_32X32, 16,
                             adaptive_partition=True)
    sizes = {int(st.mig.grid[r, c].bsize)
             for r in range(st.mig.mi_rows) for c in range(st.mig.mi_cols)}
    assert int(BlockSize.BLOCK_16X16) in sizes  # some splits happened
    assert int(BlockSize.BLOCK_32X32) in sizes  # but not everywhere


def test_adaptive_stream_bit_exact():
    frames = make_mixed_motion_frames()
    enc, dec = roundtrip(frames, qindex=120)
    # encode_stream uses fixed; now compare an explicitly adaptive encode
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig, PredStructure

    e = Vp9Encoder()
    e.set_parameter(EncoderConfig(source_width=128, source_height=96,
                                  frame_rate=30, qp=30, enc_mode=5,
        pred_structure=PredStructure.LOW_DELAY_P,
        hierarchical_levels=0))
    e.init()
    pkts = []
    for fr in frames:
        e.send_picture(fr)
        pkts.append(e.get_packet())
    buf = io.BytesIO()
    write_ivf_header(buf, 128, 96, 30, 1)
    for i, p in enumerate(pkts):
        write_ivf_frame(buf, p.data, i)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    dec2 = list(decode_ivf(buf))
    assert len(dec2) == 3

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99 if mse == 0 else 10 * np.log10(255**2 / mse)

    for fr, (y, _, _, _) in zip(frames, dec2):
        assert psnr(y, fr.y) > 30


def test_adp_budget_limits_probes(monkeypatch):
    """eb_vp9_derive_optimal_budget_per_sb analogue: with a fractional
    budget only the costliest parents may split, and the budget mask is
    exactly the top-k cost ranks."""
    from tpu_vp9.codec.inter_frame import derive_sb_probe_budget

    costs = {(0, i): i * 10 for i in range(10)}
    g = derive_sb_probe_budget(costs, 0.3)
    assert g == {(0, 7), (0, 8), (0, 9)}
    assert derive_sb_probe_budget(costs, 1.0) == set(costs)

    # end-to-end: a budgeted M6 encode still round-trips and its split
    # set is a subset of the unbudgeted one
    import io

    import numpy as np

    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.bitstream.ivf import (
        patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
    )
    from tpu_vp9.config import EncoderConfig
    from tpu_vp9.decoder.decoder import decode_ivf
    from tpu_vp9.utils.yuv import synthetic_frames

    frames = list(synthetic_frames(160, 96, 3, seed=4, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(
        source_width=160, source_height=96, frame_rate=30, qp=40,
        enc_mode=6, intra_period=-1, tpu_realtime=0))
    enc.init()
    assert enc._sig.adp_budget < 1.0
    pkts = []
    for fr in frames:
        enc.send_picture(fr)
    enc.flush()
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    buf = io.BytesIO()
    write_ivf_header(buf, 160, 96, 30, 1)
    for p in pkts:
        write_ivf_frame(buf, p.data, p.pts)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == len(frames)
    for fr, (y, _, _, _) in zip(frames[1:], dec[1:]):
        mse = np.mean((y.astype(np.float64) - fr.y.astype(np.float64)) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 28
