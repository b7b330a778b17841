"""Tile-column encoding: independence, packing, decode round-trip."""

import io

import numpy as np
import pytest

from tpu_vp9.bitstream.headers import tile_log2_limits
from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.pipeline.encoder import encode_stream
from tpu_vp9.utils.yuv import synthetic_frames


def roundtrip(frames, **kw):
    enc = encode_stream(frames, **kw)
    buf = io.BytesIO()
    write_ivf_header(buf, frames[0].width, frames[0].height, 30, 1)
    for i, ef in enumerate(enc):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(enc))
    buf.seek(0)
    return enc, list(decode_ivf(buf))


def test_tile_limits():
    assert tile_log2_limits(64)[1] == 1  # 512px: up to 2 tiles
    assert tile_log2_limits(44)[1] == 0  # CIF: single tile only
    assert tile_log2_limits(240)[1] >= 2  # 1080p: 4+ tiles


def test_two_tile_roundtrip():
    frames = list(synthetic_frames(512, 128, 3, seed=0, motion=True))
    enc, dec = roundtrip(frames, qindex=110, log2_tile_cols=1)
    for i, (ef, (y, u, v, h)) in enumerate(zip(enc, dec)):
        assert h.log2_tile_cols == 1
        st = ef.state
        np.testing.assert_array_equal(
            y, st.planes[0].recon[:128, :512], err_msg=f"frame {i}")
        np.testing.assert_array_equal(u, st.planes[1].recon[:64, :256])


def test_tiles_vs_single_similar_quality():
    frames = list(synthetic_frames(512, 128, 2, seed=1, motion=True))
    enc1, dec1 = roundtrip(frames, qindex=110, log2_tile_cols=0)
    enc2, dec2 = roundtrip(frames, qindex=110, log2_tile_cols=1)

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99 if mse == 0 else 10 * np.log10(255**2 / mse)

    p1 = psnr(dec1[1][0], frames[1].y)
    p2 = psnr(dec2[1][0], frames[1].y)
    assert abs(p1 - p2) < 1.0
    # tiles cost a little rate (contexts reset at boundary) but not much
    assert len(enc2[0].payload) < len(enc1[0].payload) * 1.25


def test_api_tile_columns_config():
    """tpu_tile_columns flows through the streaming API (RA path) and
    produces a multi-tile, conformant stream (the reference forces one
    tile; tiles are our scale-out unit)."""
    import io

    import numpy as np

    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.bitstream.ivf import write_ivf_frame, write_ivf_header
    from tpu_vp9.decoder.decoder import parse_uncompressed_header
    from tpu_vp9.config import EncoderConfig
    from tpu_vp9.decoder.decoder import decode_ivf
    from tpu_vp9.utils.yuv import synthetic_frames

    w, h = 512, 128
    frames = list(synthetic_frames(w, h, 3, seed=2, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=w, source_height=h,
                                    frame_rate=30, qp=45, enc_mode=8,
                                    intra_period=-1, tpu_tile_columns=2))
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
    hdr0, _, _ = parse_uncompressed_header(data[0])
    assert hdr0.log2_tile_cols == 1
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1, len(data))
    for i, d in enumerate(data):
        write_ivf_frame(buf, d, i)
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == len(frames)
    for s, r in zip(frames, dec):
        mse = np.mean((np.asarray(r[0], np.float64)
                       - np.asarray(s.y, np.float64)) ** 2)
        assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 25
