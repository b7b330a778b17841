"""Wavefront-batched keyframe reconstruction (SURVEY.md §2.7 EncDec
wavefront): must be bit-exact vs the sequential pass-A and decodable."""

import numpy as np
import pytest

from tpu_vp9.bitstream.headers import FrameHeader, assemble_frame
from tpu_vp9.bitstream.tables import BlockSize, TxMode
from tpu_vp9.codec import intra_frame as IF
from tpu_vp9.decoder.decoder import decode_frame
from tpu_vp9.utils.yuv import synthetic_frames


def _encode_both(frame, qindex, hints):
    tile_w, st_w = IF.encode_keyframe(
        frame, qindex, BlockSize.BLOCK_32X32, y_mode_hints=hints)
    orig = IF.encode_keyframe_wavefront
    IF.encode_keyframe_wavefront = lambda *a, **k: None
    try:
        tile_s, st_s = IF.encode_keyframe(
            frame, qindex, BlockSize.BLOCK_32X32, y_mode_hints=hints)
    finally:
        IF.encode_keyframe_wavefront = orig
    return (tile_w, st_w), (tile_s, st_s)


@pytest.mark.parametrize("w,h", [(128, 96), (96, 80), (176, 144)])
def test_wavefront_bitexact_vs_sequential(w, h):
    # 96x80: bottom block row is a forced-split fringe (80 % 32 != 0),
    # exercising the aligned-interior + sequential-fringe combination.
    frame = next(synthetic_frames(w, h, 1))
    hints = IF.openloop_mode_hints_np(frame.y, 32, 100)
    (tile_w, st_w), (tile_s, st_s) = _encode_both(frame, 100, hints)
    assert tile_w == tile_s
    for p in range(3):
        assert np.array_equal(st_w.planes[p].recon, st_s.planes[p].recon)


def test_wavefront_stream_decodes():
    w, h = 160, 112
    frame = next(synthetic_frames(w, h, 1))
    tile, st = IF.encode_keyframe(frame, 90, BlockSize.BLOCK_32X32,
                                  open_loop_md=True)
    hdr = FrameHeader(width=w, height=h, is_keyframe=True,
                      error_resilient=True, base_qindex=90,
                      tx_mode=TxMode.ALLOW_32X32)
    y, u, v, _ = decode_frame(assemble_frame(hdr, tile, st.header_updates))
    assert np.array_equal(y, st.planes[0].recon[:h, :w])
    assert np.array_equal(u, st.planes[1].recon[: (h + 1) >> 1,
                                                : (w + 1) >> 1])


def test_hint_matrix_matches_exact_predictions():
    # the linearized mode-selection matrix must track the exact integer
    # predictors to within rounding (else hints would drift off-mode)
    from tpu_vp9.ops import intra as intra_ops

    rng = np.random.default_rng(7)
    bs = 8
    above = rng.integers(0, 256, 2 * bs).astype(np.int32)
    al = np.int32(rng.integers(0, 256))
    left = rng.integers(0, 256, bs).astype(np.int32)
    exact = intra_ops.predict_all_modes(
        above[None], np.array([al]), left[None],
        np.array([True]), np.array([True]), bs, np)[0]
    ref = intra_ops.build_ref_vector(above[None], np.array([al]),
                                     left[None], np)[0].astype(np.float32)
    M = intra_ops.all_modes_matrix(bs)
    approx = (M @ ref).reshape(10, bs, bs)
    # TM clips to [0,255]; clip the linear version the same way
    approx[9] = np.clip(approx[9], 0, 255)
    assert np.abs(approx - exact).max() <= 1.0
