"""Intra predictor validation: vectorized gather maps vs literal
per-pixel transcriptions of the spec algorithms."""

import numpy as np
import pytest

from tpu_vp9.bitstream.tables import IntraMode
from tpu_vp9.ops import intra


def AVG3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def AVG2(a, b):
    return (a + b + 1) >> 1


# --- literal transcriptions of the spec predictors (test oracles) ---


def ref_d207(bs, above, left):
    d = np.zeros((bs, bs), int)
    for r in range(bs - 1):
        d[r, 0] = AVG2(left[r], left[r + 1])
    d[bs - 1, 0] = left[bs - 1]
    for r in range(bs - 2):
        d[r, 1] = AVG3(left[r], left[r + 1], left[r + 2])
    if bs >= 2:
        d[bs - 2, 1] = AVG3(left[bs - 2], left[bs - 1], left[bs - 1])
        d[bs - 1, 1] = left[bs - 1]
    for c in range(bs - 2):
        d[bs - 1, c + 2] = left[bs - 1]
    for r in range(bs - 2, -1, -1):
        for c in range(bs - 2):
            d[r, c + 2] = d[r + 1, c]
    return d


def ref_d63(bs, above, left):
    d = np.zeros((bs, bs), int)
    for c in range(bs):
        d[0, c] = AVG2(above[c], above[c + 1])
        d[1, c] = AVG3(above[c], above[c + 1], above[c + 2])
    size = bs - 2
    r = 2
    while r < bs:
        d[r, :size] = d[0, (r >> 1):(r >> 1) + size]
        d[r, size:] = above[bs - 1]
        d[r + 1, :size] = d[1, (r >> 1):(r >> 1) + size]
        d[r + 1, size:] = above[bs - 1]
        r += 2
        size -= 1
    return d


def ref_d45(bs, above, left):
    d = np.zeros((bs, bs), int)
    for x in range(bs - 1):
        d[0, x] = AVG3(above[x], above[x + 1], above[x + 2])
    d[0, bs - 1] = above[bs - 1]
    for r in range(1, bs):
        size = bs - 1 - r
        d[r, :size] = d[0, r:r + size]
        d[r, size:] = above[bs - 1]
    return d


def ref_d117(bs, above, left, al):
    a = lambda i: al if i == -1 else above[i]
    d = np.zeros((bs, bs), int)
    for c in range(bs):
        d[0, c] = AVG2(a(c - 1), a(c))
    d[1, 0] = AVG3(left[0], al, a(0))
    for c in range(1, bs):
        d[1, c] = AVG3(a(c - 2), a(c - 1), a(c))
    if bs > 2:
        d[2, 0] = AVG3(al, left[0], left[1])
    for r in range(3, bs):
        d[r, 0] = AVG3(left[r - 3], left[r - 2], left[r - 1])
    for r in range(2, bs):
        for c in range(1, bs):
            d[r, c] = d[r - 2, c - 1]
    return d


def ref_d135(bs, above, left, al):
    border = np.zeros(2 * bs - 1, int)
    for i in range(bs - 2):
        border[i] = AVG3(left[bs - 3 - i], left[bs - 2 - i], left[bs - 1 - i])
    border[bs - 2] = AVG3(al, left[0], left[1])
    border[bs - 1] = AVG3(left[0], al, above[0])
    border[bs] = AVG3(al, above[0], above[1])
    for i in range(bs - 2):
        border[bs + 1 + i] = AVG3(above[i], above[i + 1], above[i + 2])
    d = np.zeros((bs, bs), int)
    for r in range(bs):
        d[r] = border[bs - 1 - r:2 * bs - 1 - r]
    return d


def ref_d153(bs, above, left, al):
    a = lambda i: al if i == -1 else above[i]
    d = np.zeros((bs, bs), int)
    d[0, 0] = AVG2(al, left[0])
    for r in range(1, bs):
        d[r, 0] = AVG2(left[r - 1], left[r])
    d[0, 1] = AVG3(left[0], al, a(0))
    d[1, 1] = AVG3(al, left[0], left[1])
    for r in range(2, bs):
        d[r, 1] = AVG3(left[r - 2], left[r - 1], left[r])
    for c in range(bs - 2):
        d[0, c + 2] = AVG3(a(c - 1), a(c), a(c + 1))
    for r in range(1, bs):
        for c in range(bs - 2):
            d[r, c + 2] = d[r - 1, c]
    return d


ORACLES = {
    IntraMode.D207_PRED: lambda bs, a, al, l: ref_d207(bs, a, l),
    IntraMode.D63_PRED: lambda bs, a, al, l: ref_d63(bs, a, l),
    IntraMode.D45_PRED: lambda bs, a, al, l: ref_d45(bs, a, l),
    IntraMode.D117_PRED: lambda bs, a, al, l: ref_d117(bs, a, l, al),
    IntraMode.D135_PRED: lambda bs, a, al, l: ref_d135(bs, a, l, al),
    IntraMode.D153_PRED: lambda bs, a, al, l: ref_d153(bs, a, l, al),
    IntraMode.V_PRED: lambda bs, a, al, l: np.tile(a[:bs], (bs, 1)),
    IntraMode.H_PRED: lambda bs, a, al, l: np.tile(l[:, None], (1, bs)),
}


@pytest.mark.parametrize("bs", intra.BLOCK_SIZES)
@pytest.mark.parametrize("mode", list(ORACLES))
def test_directional_vs_oracle(bs, mode):
    rng = np.random.default_rng(int(mode) * 10 + bs)
    for _ in range(4):
        above = rng.integers(0, 256, 2 * bs).astype(np.int64)
        left = rng.integers(0, 256, bs).astype(np.int64)
        al = int(rng.integers(0, 256))
        want = ORACLES[mode](bs, above, al, left)
        got = intra.predict_block_full(mode, above, al, left, True, True, bs)
        np.testing.assert_array_equal(got, want, err_msg=f"{mode} bs={bs}")


@pytest.mark.parametrize("bs", intra.BLOCK_SIZES)
def test_dc_variants(bs):
    rng = np.random.default_rng(bs)
    above = rng.integers(0, 256, 2 * bs).astype(np.int64)
    left = rng.integers(0, 256, bs).astype(np.int64)
    both = intra.predict_block_full(IntraMode.DC_PRED, above, 0, left,
                                    True, True, bs)
    assert both[0, 0] == (above[:bs].sum() + left.sum() + bs) >> (
        int(np.log2(bs)) + 1)
    top = intra.predict_block_full(IntraMode.DC_PRED, above, 0, left,
                                   True, False, bs)
    assert top[0, 0] == (above[:bs].sum() + bs // 2) >> int(np.log2(bs))
    lonly = intra.predict_block_full(IntraMode.DC_PRED, above, 0, left,
                                     False, True, bs)
    assert lonly[0, 0] == (left.sum() + bs // 2) >> int(np.log2(bs))
    none = intra.predict_block_full(IntraMode.DC_PRED, above, 0, left,
                                    False, False, bs)
    assert none[0, 0] == 128


def test_tm_clip():
    above = np.array([250, 255, 3, 0], np.int64)
    left = np.array([255, 0, 128, 200], np.int64)
    p = intra.predict_block_full(IntraMode.TM_PRED, np.tile(above, 2), 1,
                                 left, True, True, 4)
    assert p.max() <= 255 and p.min() >= 0
    assert p[0, 0] == 255  # 255 + 250 - 1 clipped
    assert p[1, 3] == 0  # 0 + 0 - 1 clipped


def test_ref_samples_edges():
    plane = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    # interior block
    a, al, l = intra.build_ref_samples(plane, 8, 8, 4, 60, 60, True, True, True)
    np.testing.assert_array_equal(a[:4], plane[7, 8:12])
    np.testing.assert_array_equal(a[4:8], plane[7, 12:16])  # bs==4 real AR
    assert al == plane[7, 7]
    np.testing.assert_array_equal(l, plane[8:12, 7])
    # no above: 127s; no left: 129s
    a, al, l = intra.build_ref_samples(plane, 0, 0, 8, 60, 60, False, False, False)
    assert (a == 127).all() and al == 127 and (l == 129).all()
    # above available, left not: corner = 129
    a, al, l = intra.build_ref_samples(plane, 0, 8, 8, 60, 60, True, False, False)
    assert al == 129 and (l == 129).all()
    # frame-width clamp: block at x0=56 with frame_w=60
    a, al, l = intra.build_ref_samples(plane, 56, 8, 8, 60, 60, True, True, False)
    np.testing.assert_array_equal(a[:4], plane[7, 56:60])
    assert (a[4:8] == plane[7, 59]).all()
    assert (a[8:] == plane[7, 59]).all()


def test_predict_all_modes_batch_and_jax():
    import jax.numpy as jnp

    bs = 8
    rng = np.random.default_rng(0)
    B = 5
    above = rng.integers(0, 256, (B, 2 * bs)).astype(np.int32)
    left = rng.integers(0, 256, (B, bs)).astype(np.int32)
    al = rng.integers(0, 256, B).astype(np.int32)
    ha = np.array([True] * B)
    hl = np.array([True, False, True, True, False])
    out_np = intra.predict_all_modes(above, al, left, ha, hl, bs)
    assert out_np.shape == (B, 10, bs, bs)
    out_j = intra.predict_all_modes(
        jnp.asarray(above), jnp.asarray(al), jnp.asarray(left),
        jnp.asarray(ha), jnp.asarray(hl), bs, jnp)
    np.testing.assert_array_equal(out_np, np.asarray(out_j))
    # each mode slice matches the single-block path
    for b in range(B):
        for mode in list(ORACLES) + [IntraMode.TM_PRED]:
            single = intra.predict_block_full(
                mode, above[b], int(al[b]), left[b], bool(ha[b]), bool(hl[b]), bs)
            np.testing.assert_array_equal(out_np[b, int(mode)], single)
