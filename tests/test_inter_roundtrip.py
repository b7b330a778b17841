"""Inter (P) frame conformance: encode IPPP -> decode -> recon match."""

import io

import numpy as np
import pytest

from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.pipeline.encoder import encode_stream
from tpu_vp9.utils.yuv import synthetic_frames


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def roundtrip(frames, qindex=100, **kw):
    enc = encode_stream(frames, qindex=qindex, **kw)
    buf = io.BytesIO()
    write_ivf_header(buf, frames[0].width, frames[0].height, 30, 1)
    for i, ef in enumerate(enc):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(enc))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    return enc, dec


def test_ippp_roundtrip_bit_exact():
    frames = list(synthetic_frames(96, 80, 4, seed=0, motion=True))
    enc, dec = roundtrip(frames, qindex=120)
    assert len(dec) == 4
    for i, (ef, (y, u, v, h)) in enumerate(zip(enc, dec)):
        st = ef.state
        np.testing.assert_array_equal(
            y, st.planes[0].recon[:80, :96],
            err_msg=f"frame {i} (key={ef.is_keyframe}) Y mismatch")
        np.testing.assert_array_equal(u, st.planes[1].recon[:40, :48])
        np.testing.assert_array_equal(v, st.planes[2].recon[:40, :48])
    assert enc[0].is_keyframe and not enc[1].is_keyframe


def test_p_frames_much_smaller_than_key():
    frames = list(synthetic_frames(96, 80, 4, seed=1, motion=True))
    enc, dec = roundtrip(frames, qindex=100)
    key_size = len(enc[0].payload)
    p_sizes = [len(e.payload) for e in enc[1:]]
    assert max(p_sizes) < key_size * 0.8
    for fr, (y, _, _, _) in zip(frames, dec):
        assert psnr(y, fr.y) > 30


def test_static_scene_skips():
    frames = list(synthetic_frames(96, 80, 3, seed=2, motion=False))
    enc, dec = roundtrip(frames, qindex=120)
    # identical frames: P frames mostly skip (tiny vs the keyframe) and
    # quality must not drift across the still sequence
    key_size = len(enc[0].payload)
    sizes = [len(e.payload) for e in enc]
    # successive stills converge: strictly shrinking, last nearly all-skip
    assert sizes[0] > sizes[1] > sizes[2]
    assert sizes[2] < key_size * 0.2
    p0 = psnr(dec[0][0], frames[0].y)
    p2 = psnr(dec[2][0], frames[2].y)
    assert p2 >= p0 - 0.2


def test_keyframe_interval():
    frames = list(synthetic_frames(96, 80, 5, seed=3))
    enc, dec = roundtrip(frames, qindex=100, intra_period=1)
    assert [e.is_keyframe for e in enc] == [True, False, True, False, True]


def test_nonaligned_inter():
    frames = list(synthetic_frames(200, 120, 3, seed=4, motion=True))
    enc, dec = roundtrip(frames, qindex=110)
    for ef, (y, u, v, h) in zip(enc, dec):
        st = ef.state
        np.testing.assert_array_equal(y, st.planes[0].recon[:120, :200])
        np.testing.assert_array_equal(u, st.planes[1].recon[:60, :100])


def test_motion_found():
    # moving box: NEWMV should capture motion, quality stays high with
    # small residual payloads
    frames = list(synthetic_frames(128, 96, 3, seed=5, motion=True))
    enc, dec = roundtrip(frames, qindex=80)
    for fr, (y, _, _, _) in zip(frames, dec):
        assert psnr(y, fr.y) > 33


def test_non_error_resilient_roundtrip():
    """Opt-in non-ER: frame-context persistence + restricted MV modes must
    still round-trip bit-exactly through the stateful decoder."""
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig, PredStructure

    frames = list(synthetic_frames(96, 80, 5, seed=11, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=96, source_height=80,
                                    frame_rate=30, qp=40, enc_mode=8,
                                    error_resilient=False,
        pred_structure=PredStructure.LOW_DELAY_P,
        hierarchical_levels=0))
    enc.init()
    pkts = []
    recons = []
    for fr in frames:
        enc.send_picture(fr)
        pkts.append(enc.get_packet())
        recons.append(enc.get_recon())
    buf = io.BytesIO()
    write_ivf_header(buf, 96, 80, 30, 1)
    for i, p in enumerate(pkts):
        write_ivf_frame(buf, p.data, i)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert not dec[1][3].error_resilient
    for i, ((y, u, v, h), (ry, ru, rv)) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(y, ry, err_msg=f"frame {i}")
        np.testing.assert_array_equal(u, ru)


def test_error_resilient_never_signals_compound():
    # setup_past_independence zeroes ref_frame_sign_bias for every
    # error-resilient frame (spec 7.2), so compound must never be coded
    # there; regression for the round-2 libvpx "Frame data header is
    # corrupted" rejection of er random-access streams.
    from tpu_vp9.bitstream.headers import FrameHeader

    h = FrameHeader(is_keyframe=False, error_resilient=True,
                    ref_sign_bias=(0, 0, 1))
    assert not h.compound_allowed()
    h.error_resilient = False
    assert h.compound_allowed()
