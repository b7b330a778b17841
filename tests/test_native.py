"""Native C++ serialization must be byte-identical to the Python oracle."""

import numpy as np
import pytest

from tpu_vp9.bitstream import tables as T
from tpu_vp9.bitstream import tokenize as tok
from tpu_vp9.bitstream.bool_coder import BoolEncoder
from tpu_vp9.native import NativeBoolEncoder, get_lib, native_sad_search

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def test_bool_bits_identical():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 20000)
    probs = rng.integers(1, 256, 20000)
    e1, e2 = BoolEncoder(), NativeBoolEncoder()
    for b, p in zip(bits, probs):
        e1.put_bit(int(b), int(p))
        e2.put_bit(int(b), int(p))
    e1.put_literal(12345, 16)
    e2.put_literal(12345, 16)
    assert e1.finalize() == e2.finalize()


@pytest.mark.parametrize("ts", list(T.TxSize))
def test_coeff_write_identical(ts):
    rng = np.random.default_rng(int(ts))
    fc = T.default_frame_context()
    n = {0: 4, 1: 8, 2: 16, 3: 32}[int(ts)]
    for uv in (False, True):
        for ref in (False, True):
            probs = tok.full_probs_for(fc, ts, uv, ref)
            for trial in range(6):
                lv = rng.normal(0, 30, (n, n)).astype(np.int32)
                lv[rng.random((n, n)) < 0.6] = 0
                if trial == 5:
                    lv[:] = 0  # empty block: EOB at 0
                e1, e2 = BoolEncoder(), NativeBoolEncoder()
                eob1 = tok.write_coeffs(e1, lv, ts, T.TxType.DCT_DCT,
                                        probs, trial % 3)
                eob2 = e2.write_coeffs(lv, ts, T.TxType.DCT_DCT, probs,
                                       trial % 3)
                assert eob1 == eob2
                assert e1.finalize() == e2.finalize()


def test_coeff_write_big_magnitudes():
    # exercise CAT6 extra bits
    fc = T.default_frame_context()
    probs = tok.full_probs_for(fc, T.TxSize.TX_8X8, False, False)
    lv = np.zeros((8, 8), np.int32)
    lv[0, 0] = 4000
    lv[0, 1] = -900
    lv[1, 0] = 67
    lv[2, 2] = -35
    e1, e2 = BoolEncoder(), NativeBoolEncoder()
    tok.write_coeffs(e1, lv, T.TxSize.TX_8X8, T.TxType.DCT_DCT, probs, 1)
    e2.write_coeffs(lv, T.TxSize.TX_8X8, T.TxType.DCT_DCT, probs, 1)
    assert e1.finalize() == e2.finalize()


def test_native_sad_matches_numpy():
    rng = np.random.default_rng(1)
    n, r = 16, 8
    src = rng.integers(0, 256, (n, n)).astype(np.uint8)
    region = rng.integers(0, 256, (n + 2 * r, n + 2 * r)).astype(np.uint8)
    dy, dx, sad = native_sad_search(src, region, region.shape[1], r)
    win = np.lib.stride_tricks.sliding_window_view(region, (n, n))
    sads = np.abs(win.astype(np.int32) - src.astype(np.int32)).sum(axis=(2, 3))
    idx = np.unravel_index(np.argmin(sads), sads.shape)
    assert sad == sads[idx]
    assert (dy + r, dx + r) == idx or sads[dy + r, dx + r] == sads[idx]
