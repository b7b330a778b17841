"""GOLDEN long-term reference: per-block ref choice + conformance."""

import io

import numpy as np

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.bitstream.tables import RefFrame
from tpu_vp9.config import EncoderConfig, PredStructure
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.utils.yuv import Frame420


def occlusion_frames():
    """Static scene; an occluder crosses then leaves: GOLDEN (pre-occlusion)
    should beat LAST (occluded) when the background reappears."""
    rng = np.random.default_rng(3)
    base = rng.integers(40, 220, (96, 128)).astype(np.uint8)
    frames = []
    for t in range(6):
        y = base.copy()
        if 1 <= t <= 4:
            x = 20 * t
            y[:, x : x + 32] = 255  # occluder sweeps right
        u = np.full((48, 64), 110, np.uint8)
        v = np.full((48, 64), 140, np.uint8)
        frames.append(Frame420(y=y, u=u, v=v))
    return frames


def encode_decode(frames, qp=35, golden_interval=99):
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=128, source_height=96,
                                    frame_rate=30, qp=qp, enc_mode=7,
        pred_structure=PredStructure.LOW_DELAY_P,
        hierarchical_levels=0))
    enc.init()
    enc.golden_interval = golden_interval
    pkts = []
    sts = []
    for fr in frames:
        enc.send_picture(fr)
        pkts.append(enc.get_packet())
        sts.append(enc._refs)
    buf = io.BytesIO()
    write_ivf_header(buf, 128, 96, 30, 1)
    for i, p in enumerate(pkts):
        write_ivf_frame(buf, p.data, i)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    return enc, pkts, list(decode_ivf(buf))


def test_golden_used_and_decodes():
    frames = occlusion_frames()
    enc, pkts, dec = encode_decode(frames)
    assert len(dec) == 6

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99 if mse == 0 else 10 * np.log10(255**2 / mse)

    # reappearing background must be predicted well (GOLDEN available)
    assert psnr(dec[5][0], frames[5].y) > 32


def test_golden_blocks_chosen():
    # directly check some blocks picked GOLDEN on the reveal frame
    from tpu_vp9.codec.inter_frame import encode_pframe
    from tpu_vp9.codec.intra_frame import encode_keyframe
    from tpu_vp9.pipeline.encoder import _make_refs

    frames = occlusion_frames()
    _, st0 = encode_keyframe(frames[0], 140)
    golden = _make_refs(st0, 128, 96)
    # LAST = heavily occluded frame
    _, st3 = encode_keyframe(frames[3], 140)
    last = _make_refs(st3, 128, 96)
    tile, st = encode_pframe(frames[5], last, 140, golden_refs=golden)
    refs_used = {st.mig.grid[r, c].ref_frame[0]
                 for r in range(st.mig.mi_rows)
                 for c in range(st.mig.mi_cols)
                 if st.mig.grid[r, c].is_inter}
    assert int(RefFrame.GOLDEN) in refs_used
