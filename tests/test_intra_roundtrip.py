"""End-to-end keyframe conformance: encode -> decode -> recon match.

This is the framework's stand-in for the reference CI's vpxdec smoke test
(SURVEY.md §4): the in-repo spec decoder must reproduce the encoder's
reconstruction bit-exactly, and quality must be sane.
"""

import numpy as np
import pytest

from tpu_vp9.bitstream.headers import FrameHeader, assemble_frame
from tpu_vp9.bitstream.tables import BlockSize, TxMode
from tpu_vp9.codec.intra_frame import encode_keyframe
from tpu_vp9.decoder import decode_frame
from tpu_vp9.utils.yuv import synthetic_frames


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def encode_one(frame, qindex, block_size=BlockSize.BLOCK_32X32):
    tile, st = encode_keyframe(frame, qindex, block_size)
    h = FrameHeader(
        width=frame.width, height=frame.height, is_keyframe=True,
        error_resilient=True, base_qindex=qindex,
        tx_mode=TxMode.ALLOW_32X32)
    h.loop_filter.filter_level = 0
    payload = assemble_frame(h, tile, st.header_updates)
    return payload, st


@pytest.mark.parametrize("qindex", [60, 120, 200])
def test_keyframe_roundtrip(qindex):
    frame = next(synthetic_frames(96, 80, 1, seed=qindex))
    payload, st = encode_one(frame, qindex)
    y, u, v, h = decode_frame(payload)
    assert h.width == 96 and h.height == 80
    # decoder recon must equal encoder recon exactly
    np.testing.assert_array_equal(y, st.planes[0].recon[:80, :96])
    np.testing.assert_array_equal(u, st.planes[1].recon[:40, :48])
    np.testing.assert_array_equal(v, st.planes[2].recon[:40, :48])


def test_quality_monotonic_in_q():
    frame = next(synthetic_frames(96, 80, 1, seed=1))
    sizes, psnrs = [], []
    for q in (40, 120, 220):
        payload, st = encode_one(frame, q)
        y, u, v, _ = decode_frame(payload)
        sizes.append(len(payload))
        psnrs.append(psnr(y, frame.y))
    assert sizes[0] > sizes[1] > sizes[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]
    assert psnrs[0] > 40  # near-lossless at q40 on synthetic content
    assert psnrs[1] > 28


def test_deterministic():
    frame = next(synthetic_frames(96, 80, 1, seed=3))
    p1, _ = encode_one(frame, 100)
    p2, _ = encode_one(frame, 100)
    assert p1 == p2


def test_nonaligned_dimensions():
    # width/height not multiples of 64 nor 16: partial SBs both edges
    frame = next(synthetic_frames(200, 120, 1, seed=5))
    payload, st = encode_one(frame, 100)
    y, u, v, h = decode_frame(payload)
    assert y.shape == (120, 200)
    np.testing.assert_array_equal(y, st.planes[0].recon[:120, :200])
    np.testing.assert_array_equal(u, st.planes[1].recon[:60, :100])
    assert psnr(y, frame.y) > 30


def test_block_size_16_partitioning():
    frame = next(synthetic_frames(96, 80, 1, seed=7))
    payload, st = encode_one(frame, 100, BlockSize.BLOCK_16X16)
    y, _, _, _ = decode_frame(payload)
    np.testing.assert_array_equal(y, st.planes[0].recon[:80, :96])
