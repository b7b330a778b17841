"""Native fast-loop mode decision must be bit-identical to the Python
decide_leaf_inter walk (same candidates, searches, compound and intra
fallback), across single/multi-ref, temporal-MV, restriction, tile and
odd-dimension configurations.  Oracle: whole-tile bytes + recon planes.
"""

import os

import numpy as np
import pytest

from tpu_vp9 import native as nat
from tpu_vp9.bitstream.tables import BlockSize
from tpu_vp9.codec.inter_frame import encode_pframe
from tpu_vp9.pipeline.encoder import _make_refs
from tpu_vp9.utils.yuv import Frame420, synthetic_frames

pytestmark = pytest.mark.skipif(
    nat.get_lib() is None or not hasattr(nat.get_lib(), "fast_loop_decide"),
    reason="native library unavailable")


def _encode_both(frames, w, h, **kw):
    """Encode frame[1] against frame[0]'s keyframe recon with the native
    loop on and off; returns ((tile_a, st_a), (tile_b, st_b))."""
    ref_frame, cur = frames
    from tpu_vp9.codec.intra_frame import encode_keyframe

    _, kst = encode_keyframe(ref_frame, 100, BlockSize.BLOCK_32X32)
    refs = _make_refs(kst, w, h)
    outs = []
    for disable in ("0", "1"):
        os.environ["TPU_VP9_NO_NATIVE_FASTLOOP"] = disable
        try:
            outs.append(encode_pframe(cur, refs, 100, **kw))
        finally:
            os.environ.pop("TPU_VP9_NO_NATIVE_FASTLOOP", None)
    return outs


def _roundtrip(w, h, seed=0, **kw):
    frames = list(synthetic_frames(w, h, 2, seed=seed, motion=True))
    (tile_a, st_a), (tile_b, st_b) = _encode_both(frames, w, h, **kw)
    assert tile_a == tile_b
    for p in range(3):
        np.testing.assert_array_equal(st_a.planes[p].recon,
                                      st_b.planes[p].recon)


def test_single_ref_cif():
    _roundtrip(352, 288)


def test_odd_dimensions():
    _roundtrip(120, 84)  # forced edge descent to 16/8 leaves


def test_no_subpel_m9():
    _roundtrip(176, 144, do_subpel=False)


def test_tiles():
    _roundtrip(352, 288, log2_tile_cols=1)


def test_restriction_machinery():
    _roundtrip(176, 144, restrict_mv_modes=True)


def test_multi_ref_and_compound():
    w, h = 352, 288
    frames = list(synthetic_frames(w, h, 3, seed=3, motion=True))
    from tpu_vp9.codec.intra_frame import encode_keyframe

    _, kst = encode_keyframe(frames[0], 100, BlockSize.BLOCK_32X32)
    refs = _make_refs(kst, w, h)
    _, gst = encode_keyframe(frames[1], 104, BlockSize.BLOCK_32X32)
    golden = _make_refs(gst, w, h)
    outs = []
    for disable in ("0", "1"):
        os.environ["TPU_VP9_NO_NATIVE_FASTLOOP"] = disable
        try:
            outs.append(encode_pframe(
                frames[2], refs, 100, golden_refs=golden,
                altref_refs=golden, sign_bias=(0, 0, 1),
                ref_ranges={1: 12, 2: 8, 3: 48}))
        finally:
            os.environ.pop("TPU_VP9_NO_NATIVE_FASTLOOP", None)
    (tile_a, st_a), (tile_b, st_b) = outs
    assert tile_a == tile_b
    for p in range(3):
        np.testing.assert_array_equal(st_a.planes[p].recon,
                                      st_b.planes[p].recon)


def test_temporal_mvs():
    w, h = 176, 144
    frames = list(synthetic_frames(w, h, 3, seed=5, motion=True))
    from tpu_vp9.codec.intra_frame import encode_keyframe

    _, kst = encode_keyframe(frames[0], 100, BlockSize.BLOCK_32X32)
    refs = _make_refs(kst, w, h)
    # first P establishes a motion field snapshot
    _, pst = encode_pframe(frames[1], refs, 100)
    prev = pst.mig.snapshot_mvs()
    refs2 = _make_refs(pst, w, h)
    outs = []
    for disable in ("0", "1"):
        os.environ["TPU_VP9_NO_NATIVE_FASTLOOP"] = disable
        try:
            outs.append(encode_pframe(frames[2], refs2, 100,
                                      prev_mvs=prev))
        finally:
            os.environ.pop("TPU_VP9_NO_NATIVE_FASTLOOP", None)
    (tile_a, _), (tile_b, _) = outs
    assert tile_a == tile_b


def test_hme_large_range():
    _roundtrip(352, 288, search_range=48, seed=7)
