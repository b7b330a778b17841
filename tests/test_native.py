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


def test_native_loopfilter_matches_python(monkeypatch):
    from tpu_vp9.codec import modeinfo as MI
    from tpu_vp9.bitstream.tables import BlockSize, IntraMode, TxSize
    from tpu_vp9.ops import loopfilter as LFM
    import tpu_vp9.native as nat

    rng = np.random.default_rng(0)
    mi_rows, mi_cols = 12, 14
    mig = MI.ModeInfoGrid(mi_rows, mi_cols)
    # random mosaic of blocks with varied skip/inter/tx
    r = 0
    while r < mi_rows:
        c = 0
        h_mi = int(rng.choice([2, 4]))
        while c < mi_cols:
            w_mi = h_mi  # square blocks
            bs = {2: BlockSize.BLOCK_16X16, 4: BlockSize.BLOCK_32X32}[w_mi]
            mi = MI.ModeInfo(
                bsize=bs, tx_size=TxSize(int(rng.integers(0, 3))),
                skip=bool(rng.integers(0, 2)),
                is_inter=bool(rng.integers(0, 2)),
                inter_mode=int(rng.integers(0, 4)))
            if mi.is_inter:
                mi.ref_frame = (int(rng.integers(1, 4)), -1)
            mig.set_block(r, c, bs, mi)
            c += w_mi
        r += h_mi

    planes_a = [rng.integers(0, 256, (mi_rows * 8 + 16, mi_cols * 8 + 16)
                             ).astype(np.uint8) for _ in range(1)]
    planes_a += [rng.integers(0, 256, (mi_rows * 4 + 16, mi_cols * 4 + 16)
                              ).astype(np.uint8) for _ in range(2)]
    planes_b = [p.copy() for p in planes_a]

    LFM.loop_filter_frame(planes_a, mig, 32)  # native path
    monkeypatch.setattr(nat, "get_lib", lambda: None)
    LFM.loop_filter_frame(planes_b, mig, 32)  # python path
    for a, b in zip(planes_a, planes_b):
        np.testing.assert_array_equal(a, b)


def test_native_subpel_sad_matches_convolve():
    from tpu_vp9.bitstream import tables as T
    from tpu_vp9.native import native_subpel_sad
    from tpu_vp9.ops.inter import convolve8_2d

    rng = np.random.default_rng(1)
    n = 32
    ref = rng.integers(0, 256, (n + 40, n + 40)).astype(np.uint8)
    src = rng.integers(0, 256, (n, n)).astype(np.uint8)
    filters = T.subpel_filters(T.InterpFilter.EIGHTTAP)
    for sx, sy in ((0, 0), (4, 0), (0, 12), (7, 9), (15, 15)):
        window = ref[5 : 5 + n + 7, 6 : 6 + n + 7]
        want = convolve8_2d(window, filters, filters, sx, sy, n, n)
        want_sad = int(np.abs(want.astype(np.int32)
                              - src.astype(np.int32)).sum())
        got = native_subpel_sad(window, ref.strides[0], src, sx, sy,
                                filters[sx], filters[sy])
        assert got == want_sad, (sx, sy)


def test_native_subpel_refine_matches_python(monkeypatch):
    import tpu_vp9.native as nat
    from tpu_vp9.bitstream import tables as T
    from tpu_vp9.ops import me as me_ops
    from tpu_vp9.ops.inter import extend_borders, BORDER

    rng = np.random.default_rng(2)
    plane = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    # smooth it so subpel interpolation matters
    plane = ((plane.astype(np.int32) + np.roll(plane, 1, 0)
              + np.roll(plane, 1, 1)) // 3).astype(np.uint8)
    ref = extend_borders(plane, 128, 96)
    filters = T.subpel_filters(T.InterpFilter.EIGHTTAP)
    for px, py, mv in ((32, 32, (0, 0)), (64, 16, (2, -3)), (0, 0, (1, 1))):
        src = np.ascontiguousarray(plane[py + 1 : py + 33, px + 2 : px + 34])
        got = me_ops.subpel_refine(src, ref, px, py, BORDER, mv, filters)
        monkeypatch.setattr(nat, "native_subpel_refine_rect",
                            lambda *a, **k: None)
        want = me_ops.subpel_refine(src, ref, px, py, BORDER, mv, filters)
        monkeypatch.undo()
        assert got == want, (px, py, mv)


def test_native_mc_sad_matches_python():
    """Fused MC+SAD == predict_inter_block + abs-sum, incl. UMV clamping."""
    from tpu_vp9.native import native_mc_sad, native_mc_sad_avg, get_lib
    from tpu_vp9.ops import inter as inter_ops
    from tpu_vp9.ops.inter import extend_borders, BORDER

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    w, h = 128, 96
    mi_rows, mi_cols = h // 8, w // 8
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    plane2 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    ref = extend_borders(plane, w, h)
    ref2 = extend_borders(plane2, w, h)
    src_full = rng.integers(0, 256, (h, w)).astype(np.uint8)
    cases = [
        (0, 0, 8, (0, 0)), (0, 0, 8, (-999, -999)),   # clamp far corner
        (4, 6, 16, (13, -27)), (2, 2, 32, (5, 3)),
        (0, 8, 64, (999, 999)),                        # clamp other corner
        (8, 12, 8, (-3, 7)), (6, 10, 16, (31, -31)),
    ]
    for mi_row, mi_col, n, mv in cases:
        if mi_row * 8 + n > h or mi_col * 8 + n > w:
            continue
        src = src_full[mi_row * 8 : mi_row * 8 + n,
                       mi_col * 8 : mi_col * 8 + n]
        pred = inter_ops.predict_inter_block(
            ref, mi_row, mi_col, 0, 0, n, n, mv, 0, mi_rows, mi_cols)
        want = int(np.abs(pred.astype(np.int32)
                          - src.astype(np.int32)).sum())
        got = native_mc_sad(ref, BORDER, mi_row, mi_col, n, n, mv,
                            mi_rows, mi_cols, src)
        assert got == want, (mi_row, mi_col, n, mv)
        # compound average path
        mv2 = (mv[1] // 2, mv[0] // 2)
        pred2 = inter_ops.predict_inter_block(
            ref2, mi_row, mi_col, 0, 0, n, n, mv2, 0, mi_rows, mi_cols)
        avg = (pred.astype(np.int32) + pred2.astype(np.int32) + 1) >> 1
        want2 = int(np.abs(avg - src.astype(np.int32)).sum())
        got2 = native_mc_sad_avg(ref, ref2, BORDER, mi_row, mi_col, n, n,
                                 mv, mv2, mi_rows, mi_cols, src)
        assert got2 == want2, (mi_row, mi_col, n, mv)


def test_native_boolenc_buffered_matches_python():
    """Buffered put_many path == Python BoolEncoder byte-for-byte."""
    from tpu_vp9.bitstream.bool_coder import BoolEncoder
    from tpu_vp9.native import get_lib, NativeBoolEncoder

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    ops = []
    for _ in range(4000):
        if rng.random() < 0.8:
            ops.append(("bit", int(rng.integers(0, 2)),
                        int(rng.integers(1, 256))))
        else:
            nb = int(rng.integers(1, 9))
            ops.append(("lit", int(rng.integers(0, 1 << nb)), nb))
    py, nat_enc = BoolEncoder(), NativeBoolEncoder()
    for kind, a, b in ops:
        if kind == "bit":
            py.put_bit(a, b)
            nat_enc.put_bit(a, b)
        else:
            py.put_literal(a, b)
            nat_enc.put_literal(a, b)
    assert py.finalize() == nat_enc.finalize()


def test_native_coeff_token_cost_matches_python_oracle():
    """The RD full-loop coeff coster must price exactly what the
    native/python token walks would encode (rd_cost._py_coeff_cost is
    the line-by-line oracle of native coeff_token_cost)."""
    from tpu_vp9 import native as nat
    from tpu_vp9.bitstream.tables import TxSize, default_frame_context
    from tpu_vp9.codec import rd_cost as R

    if nat.get_lib() is None:
        pytest.skip("native library unavailable")
    fc = default_frame_context()
    fcst = R.FrameCosts(fc, 100)
    rng = np.random.default_rng(3)
    for ts, n in ((TxSize.TX_4X4, 4), (TxSize.TX_8X8, 8),
                  (TxSize.TX_16X16, 16), (TxSize.TX_32X32, 32)):
        for density, mag in ((0.0, 1), (0.1, 8), (0.5, 300), (1.0, 20000)):
            lv = (rng.integers(-mag, mag + 1, (7, n, n))
                  * (rng.random((7, n, n)) < density)).astype(np.int32)
            for uv in (False, True):
                probs = fcst._coef_full[(int(ts), uv, True)]
                for c0 in (0, 1, 2):
                    got = fcst.coeff_rate(lv, ts, uv, True, c0)
                    want = [R._py_coeff_cost(lv[i], ts, probs, c0)
                            for i in range(7)]
                    assert got.tolist() == want, (ts, density, uv, c0)


def test_native_mc_sse_matches_python():
    """SSE fused-MC metrics must equal the python predict + square sum."""
    from tpu_vp9 import native as nat
    from tpu_vp9.ops import inter as inter_ops
    from tpu_vp9.ops.inter import BORDER

    if nat.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    h, w = 64, 96
    mi_rows, mi_cols = h // 8, w // 8
    plane = rng.integers(0, 255, (h + 2 * BORDER, w + 2 * BORDER),
                         dtype=np.uint8)
    plane2 = rng.integers(0, 255, plane.shape, dtype=np.uint8)
    src = rng.integers(0, 255, (h, w), dtype=np.uint8)
    for _ in range(40):
        bw = int(rng.choice([8, 16, 32]))
        mi_r = int(rng.integers(0, mi_rows - bw // 8 + 1))
        mi_c = int(rng.integers(0, mi_cols - bw // 8 + 1))
        mv = (int(rng.integers(-100, 100)), int(rng.integers(-100, 100)))
        mv2 = (int(rng.integers(-100, 100)), int(rng.integers(-100, 100)))
        blk = src[mi_r * 8 : mi_r * 8 + bw, mi_c * 8 : mi_c * 8 + bw]
        got = nat.native_mc_sse(plane, BORDER, mi_r, mi_c, bw, bw, mv,
                                mi_rows, mi_cols, blk)
        pred = inter_ops.predict_inter_block(
            plane, mi_r, mi_c, 0, 0, bw, bw, mv, 0, mi_rows, mi_cols)
        d = pred.astype(np.int64) - blk.astype(np.int64)
        assert got == int((d * d).sum())
        got2 = nat.native_mc_sse_avg(plane, plane2, BORDER, mi_r, mi_c,
                                     bw, bw, mv, mv2, mi_rows, mi_cols,
                                     blk)
        p2 = inter_ops.predict_inter_block(
            plane2, mi_r, mi_c, 0, 0, bw, bw, mv2, 0, mi_rows, mi_cols)
        avg = (pred.astype(np.int64) + p2.astype(np.int64) + 1) >> 1
        d2 = avg - blk.astype(np.int64)
        assert got2 == int((d2 * d2).sum())
