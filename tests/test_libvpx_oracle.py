"""Independent conformance: decode our streams with the SYSTEM libvpx.

Round 1's oracle was self-authored (encoder and decoder share tables), so
a shared spec misreading could pass round-trip.  Here every stream must
decode with Debian's libvpx (no shared code), and — the strongest check —
the decoded pixels must be BIT-EXACT with the encoder's own recon: any
drift in transforms, MC, intra prediction, or loop filter fails loudly.
"""

import io

import numpy as np
import pytest

from tools.libvpx_oracle import available, decode_ivf, psnr
from tpu_vp9.api import Vp9Encoder
from tpu_vp9.bitstream.ivf import write_ivf_frame, write_ivf_header
from tpu_vp9.config import (
    EncoderConfig, PredStructure, RateControlMode, Tune,
)
from tpu_vp9.utils.yuv import synthetic_frames

pytestmark = pytest.mark.skipif(not available(),
                                reason="system libvpx not present")


def _encode(w, h, n, **kw):
    frames = list(synthetic_frames(w, h, n, seed=3, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=w, source_height=h,
                                    frame_rate=30, **kw))
    enc.init()
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1, n)
    for fr in frames:
        enc.send_picture(fr)
    enc.flush()
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        write_ivf_frame(buf, pkt.data, pkt.pts)
    return frames, buf.getvalue()


@pytest.mark.parametrize("intra_period,tiles", [(-1, 0), (2, 0)])
def test_encode_stream_recon_bit_exact_vs_libvpx(intra_period, tiles):
    # pipeline-level: every frame's internal recon must equal the system
    # libvpx decode of the bitstream, byte for byte
    from tpu_vp9.pipeline.encoder import encode_stream

    w, h = 176, 144
    frames = list(synthetic_frames(w, h, 5, seed=3, motion=True))
    encoded = encode_stream(frames, qindex=100, intra_period=intra_period,
                            log2_tile_cols=tiles)
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1, len(encoded))
    for ef in encoded:
        write_ivf_frame(buf, ef.payload, ef.pts)
    dec = decode_ivf(buf.getvalue())
    assert len(dec) == len(encoded)
    for i, (y, u, v) in enumerate(dec):
        st = encoded[i].state
        np.testing.assert_array_equal(y, st.planes[0].recon[:h, :w],
                                      err_msg=f"frame {i} plane Y")
        np.testing.assert_array_equal(
            u, st.planes[1].recon[: h >> 1, : w >> 1],
            err_msg=f"frame {i} plane U")
        np.testing.assert_array_equal(
            v, st.planes[2].recon[: h >> 1, : w >> 1],
            err_msg=f"frame {i} plane V")


@pytest.mark.parametrize("em,ip,er", [(8, -1, False), (2, 3, False),
                                      (9, -1, True)])
def test_ld_streams_decode(em, ip, er):
    frames, ivf = _encode(
        176, 144, 5, qp=40, enc_mode=em, intra_period=ip,
        error_resilient=er)
    dec = decode_ivf(ivf)
    assert len(dec) == 5
    for i, (y, u, v) in enumerate(dec):
        assert psnr(y, frames[i].y) > 30.0


def test_ra_pyramid_stream_decodes():
    # random-access hierarchical GOP with hidden ALTREFs + superframes
    frames, ivf = _encode(
        176, 144, 9, qp=40, enc_mode=6, intra_period=-1,
        pred_structure=PredStructure.RANDOM_ACCESS)
    dec = decode_ivf(ivf)
    assert len(dec) == 9
    for i, (y, _, _) in enumerate(dec):
        assert psnr(y, frames[i].y) > 29.0, f"frame {i}"


def test_odd_dims_and_tiles_decode():
    frames, ivf = _encode(
        322, 242, 3, qp=35, enc_mode=7, intra_period=-1)
    dec = decode_ivf(ivf)
    assert len(dec) == 3
    for i, (y, _, _) in enumerate(dec):
        assert psnr(y, frames[i].y) > 30.0
    frames, ivf = _encode(
        640, 128, 3, qp=35, enc_mode=8, intra_period=-1,
        tpu_tile_columns=4)
    dec = decode_ivf(ivf)
    assert len(dec) == 3
    for i, (y, _, _) in enumerate(dec):
        assert psnr(y, frames[i].y) > 30.0


def test_vbr_stream_decodes():
    frames, ivf = _encode(
        176, 144, 6, qp=40, enc_mode=8, intra_period=-1,
        rate_control_mode=RateControlMode.VBR, target_bit_rate=250_000,
        tune=Tune.SQ)
    dec = decode_ivf(ivf)
    assert len(dec) == 6
