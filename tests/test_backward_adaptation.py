"""Backward probability adaptation (frame_parallel_decoding_mode=0).

Encoder and decoder must count identical symbols and merge identically;
any divergence desynchronizes the bool decoder within a frame or two, so
multi-frame bit-exact round trips are a strong conformance check.
"""

import io

import numpy as np

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.bitstream.ivf import write_ivf_frame, write_ivf_header
from tpu_vp9.codec import adapt
from tpu_vp9.config import EncoderConfig, PredStructure
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.utils.yuv import synthetic_frames


def _roundtrip(fpdm, n=8, enc_mode=8, qp=40):
    frames = list(synthetic_frames(352, 288, n, seed=0, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(
        source_width=352, source_height=288, frame_rate=30, qp=qp,
        enc_mode=enc_mode, intra_period=-1, frame_parallel_decoding=fpdm,
        pred_structure=PredStructure.LOW_DELAY_P,
        hierarchical_levels=0))
    enc.init()
    pkts, recons = [], []
    for fr in frames:
        enc.send_picture(fr)
        pkts.append(enc.get_packet().data)
        recons.append(enc.get_recon())
    buf = io.BytesIO()
    write_ivf_header(buf, 352, 288, 30, 1, num_frames=len(pkts))
    for i, p in enumerate(pkts):
        write_ivf_frame(buf, p, i)
    buf.seek(0)
    dec = list(decode_ivf(buf))
    for i, ((y, u, v, h), (ry, ru, rv)) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(y, ry, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(u, ru, err_msg=f"frame {i} U")
    return sum(len(p) for p in pkts), dec


def test_fpdm0_roundtrip_bitexact_and_smaller():
    bytes1, dec1 = _roundtrip(fpdm=True)
    bytes0, dec0 = _roundtrip(fpdm=False)
    assert dec0[0][3].frame_parallel_decoding_mode is False
    assert dec1[0][3].frame_parallel_decoding_mode is True
    # adaptation must not cost bits (it converges probs toward the stats)
    assert bytes0 < bytes1


def test_fpdm0_with_tx_select_and_golden():
    # M4: TX_MODE_SELECT + adaptive partitioning exercise the tx and
    # partition count paths
    _roundtrip(fpdm=False, enc_mode=4, n=6)


def test_merge_probs_reference_values():
    # merge_probs with den==0 keeps 128 weighting of pre (factor 0)
    assert adapt.merge_probs(np.uint8(200), 0, 0, 24, 112) == 200
    # full saturation: factor = 112, new prob = get_prob(24, 24) = 255
    out = adapt.merge_probs(np.uint8(100), 24, 0, 24, 112)
    exact = (100 * (256 - 112) + 255 * 112 + 128) >> 8
    assert out == exact
    # mode_mv path: den==0 must return pre exactly
    assert adapt.mode_mv_merge_probs(np.uint8(7), 0, 0) == 7


def test_tree_merge_zero_counts_identity():
    pre = np.array([[10, 20, 30]], np.uint8)
    out = adapt.tree_merge_probs("partition_tree", pre,
                                 np.zeros((1, 4), np.int64))
    np.testing.assert_array_equal(out, pre)


def test_inc_mv_matches_component_decomposition():
    c = adapt.new_mode_counts()
    adapt.inc_mv(c, (0, 0))   # joint 0, no components
    adapt.inc_mv(c, (3, 0))   # vertical only
    adapt.inc_mv(c, (0, -70))  # horizontal only, class > 0
    # joints: ZERO, HNZVZ (col only), VNZHZ (row only), HNZVNZ
    assert c["mv_joints"].tolist() == [1, 1, 1, 0]
    assert c["mv_sign"][0].tolist() == [1, 0]   # row +3
    assert c["mv_sign"][1].tolist() == [0, 1]   # col -70
    # |{-70}| - 1 = 69 -> class 3 (offset 5), bits counted for 3 bits
    assert c["mv_classes"][1, 3] == 1
    assert c["mv_bits"][1].sum() == 3
