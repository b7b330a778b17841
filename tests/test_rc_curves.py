"""libvpx RC curve math tests (rc_curves.py)."""

import numpy as np

from tpu_vp9.pipeline import rc_curves as C


def test_qindex_q_roundtrip_monotone():
    qs = [C.qindex_to_q(i) for i in range(256)]
    assert all(b >= a for a, b in zip(qs, qs[1:]))
    for i in (0, 50, 128, 255):
        assert C.q_to_qindex(C.qindex_to_q(i)) == i


def test_compute_qdelta_sign():
    q = C.qindex_to_q(128)
    assert C.compute_qdelta(q, q * 0.25) < 0
    assert C.compute_qdelta(q, q) == 0
    assert C.compute_qdelta(q, q * 2.0) > 0


def test_qp_scaling_layers():
    # anchors boosted hardest, leaves at/below base quality
    for base in (60, 128, 200):
        qs = [C.qp_scaling_qindex(base, False, tl) for tl in range(5)]
        assert qs[0] < qs[1] < qs[2] <= qs[3] == base
        kf = C.qp_scaling_qindex(base, True, 0)
        assert kf < qs[0]  # keyframes get the deepest boost (0.25x)


def test_minq_luts_shape_and_bounds():
    for lut in (C.KF_LOW_MOTION_MINQ, C.KF_HIGH_MOTION_MINQ,
                C.ARFGF_LOW_MOTION_MINQ, C.INTER_MINQ):
        assert lut.shape == (256,)
        assert lut.min() >= 0 and lut.max() <= 255
        assert (np.diff(lut) >= 0).all()  # monotone in active-worst q


def test_bits_per_mb_monotone_and_regulate():
    bpm = [C.bits_per_mb(False, i) for i in range(1, 256)]
    assert all(b <= a for a, b in zip(bpm, bpm[1:]))
    # regulate_q hits the highest q meeting an achievable target
    mbs = 396  # CIF
    q = C.regulate_q(40_000, mbs, False, 1.0, 0, 255)
    proj = C.projected_bits(q, mbs, False, 1.0)
    assert proj <= 40_000
    if q > 0:
        assert C.projected_bits(q - 1, mbs, False, 1.0) > 40_000
