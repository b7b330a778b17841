"""Loop filter kernel validation against literal spec transcriptions."""

import numpy as np
import pytest

from tpu_vp9.ops import loopfilter as LF


def c8(t):
    return max(-128, min(127, t))


def ref_filter4(mask, thresh, pix):
    """Literal filter4 on a 1-D pixel line dict {-2,-1,0,1} offsets."""
    p1, p0, q0, q1 = pix[-2], pix[-1], pix[0], pix[1]
    hev = int(abs(p1 - p0) > thresh or abs(q1 - q0) > thresh)
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    f = c8(ps1 - qs1) if hev else 0
    f = c8(f + 3 * (qs0 - ps0)) if mask else 0
    f1 = c8(f + 4) >> 3
    f2 = c8(f + 3) >> 3
    out = dict(pix)
    out[0] = c8(qs0 - f1) + 128
    out[-1] = c8(ps0 + f2) + 128
    fa = ((f1 + 1) >> 1) if not hev else 0
    out[1] = c8(qs1 - fa) + 128
    out[-2] = c8(ps1 + fa) + 128
    return out


def ref_mask(limit, blimit, pix):
    m = any(abs(pix[-k - 2] - pix[-k - 1]) > limit for k in range(3))
    m |= any(abs(pix[k + 1] - pix[k]) > limit for k in range(3))
    m |= abs(pix[-1] - pix[0]) * 2 + abs(pix[-2] - pix[1]) // 2 > blimit
    return not m


def ref_flat4(pix):
    return not (
        any(abs(pix[-k] - pix[-1]) > 1 for k in (2, 3, 4))
        or any(abs(pix[k] - pix[0]) > 1 for k in (1, 2, 3)))


def ref_flat5(pix):
    return all(abs(pix[-k] - pix[-1]) <= 1 for k in (5, 6, 7, 8)) and \
        all(abs(pix[k] - pix[0]) <= 1 for k in (4, 5, 6, 7))


def ref_filter8(mask, thresh, pix):
    flat = ref_flat4(pix)
    if flat and mask:
        p = [pix[-1 - k] for k in range(4)]
        q = [pix[k] for k in range(4)]
        out = dict(pix)

        def rp(x):
            return (x + 4) >> 3

        out[-3] = rp(p[3] + p[3] + p[3] + 2 * p[2] + p[1] + p[0] + q[0])
        out[-2] = rp(p[3] + p[3] + p[2] + 2 * p[1] + p[0] + q[0] + q[1])
        out[-1] = rp(p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2])
        out[0] = rp(p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3])
        out[1] = rp(p[1] + p[0] + q[0] + 2 * q[1] + q[2] + q[3] + q[3])
        out[2] = rp(p[0] + q[0] + q[1] + 2 * q[2] + q[3] + q[3] + q[3])
        return out
    return ref_filter4(mask, thresh, pix)


def ref_filter16(mask, thresh, pix):
    flat = ref_flat4(pix)
    flat2 = ref_flat5(pix)
    if flat2 and flat and mask:
        p = [pix[-1 - k] for k in range(8)]
        q = [pix[k] for k in range(8)]
        out = dict(pix)

        def rp(x):
            return (x + 8) >> 4

        # literal 15-tap formulas from the spec
        out[-7] = rp(p[7] * 7 + p[6] * 2 + p[5] + p[4] + p[3] + p[2] + p[1]
                     + p[0] + q[0])
        out[-6] = rp(p[7] * 6 + p[6] + p[5] * 2 + p[4] + p[3] + p[2] + p[1]
                     + p[0] + q[0] + q[1])
        out[-5] = rp(p[7] * 5 + p[6] + p[5] + p[4] * 2 + p[3] + p[2] + p[1]
                     + p[0] + q[0] + q[1] + q[2])
        out[-4] = rp(p[7] * 4 + p[6] + p[5] + p[4] + p[3] * 2 + p[2] + p[1]
                     + p[0] + q[0] + q[1] + q[2] + q[3])
        out[-3] = rp(p[7] * 3 + p[6] + p[5] + p[4] + p[3] + p[2] * 2 + p[1]
                     + p[0] + q[0] + q[1] + q[2] + q[3] + q[4])
        out[-2] = rp(p[7] * 2 + p[6] + p[5] + p[4] + p[3] + p[2] + p[1] * 2
                     + p[0] + q[0] + q[1] + q[2] + q[3] + q[4] + q[5])
        out[-1] = rp(p[7] + p[6] + p[5] + p[4] + p[3] + p[2] + p[1] + p[0] * 2
                     + q[0] + q[1] + q[2] + q[3] + q[4] + q[5] + q[6])
        out[0] = rp(p[6] + p[5] + p[4] + p[3] + p[2] + p[1] + p[0] + q[0] * 2
                    + q[1] + q[2] + q[3] + q[4] + q[5] + q[6] + q[7])
        out[1] = rp(p[5] + p[4] + p[3] + p[2] + p[1] + p[0] + q[0] + q[1] * 2
                    + q[2] + q[3] + q[4] + q[5] + q[6] + q[7] * 2)
        out[2] = rp(p[4] + p[3] + p[2] + p[1] + p[0] + q[0] + q[1] + q[2] * 2
                    + q[3] + q[4] + q[5] + q[6] + q[7] * 3)
        out[3] = rp(p[3] + p[2] + p[1] + p[0] + q[0] + q[1] + q[2] + q[3] * 2
                    + q[4] + q[5] + q[6] + q[7] * 4)
        out[4] = rp(p[2] + p[1] + p[0] + q[0] + q[1] + q[2] + q[3] + q[4] * 2
                    + q[5] + q[6] + q[7] * 5)
        out[5] = rp(p[1] + p[0] + q[0] + q[1] + q[2] + q[3] + q[4] + q[5] * 2
                    + q[6] + q[7] * 6)
        out[6] = rp(p[0] + q[0] + q[1] + q[2] + q[3] + q[4] + q[5] + q[6] * 2
                    + q[7] * 7)
        return out
    return ref_filter8(mask, thresh, pix)


@pytest.mark.parametrize("width", [4, 8, 16])
@pytest.mark.parametrize("lvl", [4, 17, 40, 63])
def test_filter_edge_vs_literal(width, lvl):
    rng = np.random.default_rng(width * 100 + lvl)
    lim, mblim = LF.sharpness_limits(0)
    n = 64
    for trial in range(6):
        if trial < 3:
            line = rng.integers(0, 256, (n, 16)).astype(np.int32)
        else:
            # smooth content (exercises flat masks / wide filters)
            base = rng.integers(60, 200, (n, 1))
            line = base + rng.integers(-1, 2, (n, 16))
        p = [line[:, 7 - k].copy() for k in range(8)]
        q = [line[:, 8 + k].copy() for k in range(8)]
        taps = 8 if width == 16 else 4
        newp, newq = LF.filter_edge(p[:taps], q[:taps], width, lvl, lim,
                                    mblim)
        thresh = LF.hev_thresh(lvl)
        for i in range(n):
            pix = {-(k + 1): int(line[i, 7 - k]) for k in range(8)}
            pix.update({k: int(line[i, 8 + k]) for k in range(8)})
            mask = ref_mask(int(lim[lvl]), int(mblim[lvl]), pix)
            if width == 4:
                want = ref_filter4(mask, thresh, pix)
            elif width == 8:
                want = ref_filter8(mask, thresh, pix)
            else:
                want = ref_filter16(mask, thresh, pix)
            for k in range(len(newp)):
                assert newp[k][i] == want[-(k + 1)], (
                    f"p{k} row {i} w{width} lvl{lvl}")
            for k in range(len(newq)):
                assert newq[k][i] == want[k], f"q{k} row {i}"


def test_level_lut_defaults():
    lut = LF.build_level_lut(32, (1, 0, -1, -1), (0, 0), True)
    # scale = 2 at level 32: intra 32+2=34, last 32, golden/alt 30
    assert lut[0, 0] == 34
    assert lut[1, 0] == 32 and lut[1, 1] == 32
    assert lut[2, 0] == 30 and lut[3, 1] == 30


def test_pick_filter_level_monotone():
    lvls = [LF.pick_filter_level(q, False) for q in (20, 80, 160, 250)]
    assert lvls == sorted(lvls)
    assert LF.pick_filter_level(160, True) < LF.pick_filter_level(160, False)
