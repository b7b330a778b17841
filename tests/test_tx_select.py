"""TX_MODE_SELECT: per-block transform sizes round-trip + effectiveness."""

import io

import numpy as np

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.bitstream.tables import TxSize
from tpu_vp9.config import EncoderConfig, PredStructure
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.utils.yuv import Frame420


def detail_frames():
    """Sharp detail concentrated in parts of blocks: smaller tx should be
    chosen there."""
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:96, 0:128]
    base = (50 + yy // 3).astype(np.uint8)
    frames = []
    for t in range(3):
        y = base.copy()
        y[32:48, 32:48] = rng.integers(0, 255, (16, 16))  # busy quadrant
        y[10:16, 80 + t : 96 + t] = 240
        u = np.full((48, 64), 100, np.uint8)
        v = np.full((48, 64), 150, np.uint8)
        frames.append(Frame420(y=y, u=u, v=v))
    return frames


def encode(frames, enc_mode=5, qp=40):
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=128, source_height=96,
                                    frame_rate=30, qp=qp,
                                    enc_mode=enc_mode,
        pred_structure=PredStructure.LOW_DELAY_P,
        hierarchical_levels=0))
    enc.init()
    pkts = []
    sts = []
    for fr in frames:
        enc.send_picture(fr)
        pkts.append(enc.get_packet())
    buf = io.BytesIO()
    write_ivf_header(buf, 128, 96, 30, 1)
    for i, p in enumerate(pkts):
        write_ivf_frame(buf, p.data, i)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    return pkts, list(decode_ivf(buf))


def test_tx_select_roundtrip():
    frames = detail_frames()
    pkts, dec = encode(frames, enc_mode=5)
    assert len(dec) == 3

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99 if mse == 0 else 10 * np.log10(255**2 / mse)

    for fr, (y, _, _, _) in zip(frames, dec):
        assert psnr(y, fr.y) > 30


def test_tx_select_vs_fixed():
    frames = detail_frames()
    pkts_sel, dec_sel = encode(frames, enc_mode=5)  # SELECT on
    pkts_fix, dec_fix = encode(frames, enc_mode=8)  # fixed tx

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99 if mse == 0 else 10 * np.log10(255**2 / mse)

    # SELECT must not be worse in quality at similar size on P frames
    p_sel = psnr(dec_sel[2][0], frames[2].y)
    p_fix = psnr(dec_fix[2][0], frames[2].y)
    assert p_sel > p_fix - 0.5
