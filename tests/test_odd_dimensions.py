"""Odd (non-SB-multiple) dimensions across presets and structures.

The reference supports 64x64..8192x4320 at any pixel parity
(EbSvtVp9Enc.h:176-288); partition forcing, chroma rounding, and border
extension must all agree between encoder and decoder at frame edges.
"""

import io

import numpy as np
import pytest

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.bitstream.ivf import write_ivf_frame, write_ivf_header
from tpu_vp9.config import EncoderConfig, PredStructure
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.utils.yuv import synthetic_frames


@pytest.mark.parametrize("w,h,em,ps", [
    (67, 129, 9, 0),    # odd both axes, fast preset, RA
    (129, 65, 5, 0),    # odd both axes, mid preset (partition tree), RA
    (176, 144, 0, 2),   # QCIF, quality preset (sub-8x8), low-delay
])
def test_odd_dimensions_roundtrip(w, h, em, ps):
    frames = list(synthetic_frames(w, h, 5, seed=1, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=w, source_height=h,
                                    frame_rate=30, qp=45, enc_mode=em,
                                    pred_structure=PredStructure(ps),
                                    intra_period=-1))
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
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1, len(data))
    for i, d in enumerate(data):
        write_ivf_frame(buf, d, i)
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == len(frames)
    for s, r in zip(frames, dec):
        assert r[0].shape == (h, w)
        mse = np.mean((np.asarray(r[0], np.float64)
                       - np.asarray(s.y, np.float64)) ** 2)
        assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 25


def test_min_dimension_validation():
    """Below-64 dimensions are rejected like the reference's envelope."""
    enc = Vp9Encoder()
    with pytest.raises(ValueError):
        enc.set_parameter(EncoderConfig(source_width=100, source_height=62,
                                        frame_rate=30, qp=45))
