"""Validation of the VP9 normative tables and derived structures."""

import numpy as np
import pytest

from tpu_vp9.bitstream import tables as T
from tpu_vp9.bitstream.bool_coder import BoolDecoder, BoolEncoder


def test_known_spec_values():
    # Anchor values from the VP9 spec / libvpx.
    assert T.dc_quant(0) == 4 and T.dc_quant(255) == 1336
    assert T.ac_quant(0) == 4 and T.ac_quant(255) == 1828
    np.testing.assert_array_equal(
        T.scan_order(T.TxSize.TX_4X4, T.TxType.DCT_DCT)[0],
        [0, 4, 1, 5, 8, 2, 12, 9, 3, 6, 13, 10, 7, 14, 11, 15],
    )
    assert T.tbl("default_skip_probs").tolist() == [192, 128, 64]
    assert T.tbl("default_intra_inter_prob").tolist() == [9, 102, 187, 225]


@pytest.mark.parametrize(
    "tree,n_leaves",
    [
        ("intra_mode_tree", 10),
        ("inter_mode_tree", 4),
        ("partition_tree", 4),
        ("switchable_interp_tree", 3),
        ("coef_con_tree", 9),
        ("mv_joint_tree", 4),
        ("mv_class_tree", 11),
        ("mv_fp_tree", 4),
    ],
)
def test_tree_paths_complete(tree, n_leaves):
    paths = T.tree_paths(tree)
    assert len(paths) == n_leaves
    # Paths must be prefix-free (valid code tree).
    bitstrings = {p.bits for p in paths.values()}
    assert len(bitstrings) == n_leaves


def test_tree_roundtrip_all_tokens():
    probs = np.array([200, 60, 128, 90, 30, 250, 180, 77, 150], dtype=np.uint8)
    enc = BoolEncoder()
    tokens = list(range(10)) * 3
    for t in tokens:
        T.write_token(enc, "intra_mode_tree", probs, t)
    dec = BoolDecoder(enc.finalize())
    out = [T.read_token(dec, "intra_mode_tree", probs) for _ in tokens]
    assert out == tokens


def derive_neighbors(scan, size, kind):
    """Spec rule: context neighbors of each scanned coefficient are its
    already-coded above/left positions; directional (row/col) scans use a
    single neighbor along the scan's primary direction."""
    n = scan.size
    iscan = np.zeros(n, dtype=np.int64)
    iscan[scan] = np.arange(n)
    nbrs = np.zeros((n + 1, 2), dtype=np.int64)
    for i in range(1, n):
        p = scan[i]
        r, c = divmod(int(p), size)
        above = (r - 1) * size + c if r > 0 else None
        left = r * size + (c - 1) if c > 0 else None
        if kind == "row":  # primary: left, fallback above
            q = left if left is not None else above
            cands = [q, q]
        elif kind == "col":  # primary: above, fallback left
            q = above if above is not None else left
            cands = [q, q]
        else:
            cands = [q for q in (above, left) if q is not None and iscan[q] < i]
            assert cands, f"scan index {i} has no coded neighbor"
            if len(cands) == 1:
                cands = [cands[0], cands[0]]
        nbrs[i] = sorted(cands)
    return nbrs


@pytest.mark.parametrize(
    "ts,tt",
    [
        (T.TxSize.TX_4X4, T.TxType.DCT_DCT),
        (T.TxSize.TX_4X4, T.TxType.ADST_DCT),
        (T.TxSize.TX_4X4, T.TxType.DCT_ADST),
        (T.TxSize.TX_8X8, T.TxType.DCT_DCT),
        (T.TxSize.TX_16X16, T.TxType.DCT_DCT),
        (T.TxSize.TX_32X32, T.TxType.DCT_DCT),
    ],
)
def test_neighbors_match_derivation(ts, tt):
    scan, iscan, nbrs = T.scan_order(ts, tt)
    size = {T.TxSize.TX_4X4: 4, T.TxSize.TX_8X8: 8,
            T.TxSize.TX_16X16: 16, T.TxSize.TX_32X32: 32}[ts]
    kind = {T.TxType.ADST_DCT: "row", T.TxType.DCT_ADST: "col"}.get(tt, "default")
    derived = derive_neighbors(scan, size, kind)
    # Stored table rows may be in either order; compare as sorted pairs.
    got = np.sort(nbrs[: scan.size], axis=1)
    np.testing.assert_array_equal(got, derived[: scan.size])
    # iscan really inverts scan
    np.testing.assert_array_equal(scan[iscan], np.arange(scan.size))


def test_model_to_full():
    fc = T.default_frame_context()
    model = fc.coef_probs[T.TxSize.TX_4X4]
    full = T.model_to_full(model)
    assert full.shape == model.shape[:-1] + (11,)
    np.testing.assert_array_equal(full[..., :3], model)
    # pivot expansion uses pareto row pivot-1
    pivot = model[0, 0, 1, 0, 2]
    np.testing.assert_array_equal(
        full[0, 0, 1, 0, 3:], T.tbl("pareto8_full")[pivot - 1]
    )


def test_frame_context_plausible():
    fc = T.default_frame_context()
    for ts in T.TxSize:
        p = fc.coef_probs[ts]
        assert p.shape == (2, 2, 6, 6, 3)
        # band>0 probs are nonzero where populated
        assert p[..., 1:, :3, :].min() >= 1
    assert fc.nmv.joints.shape == (3,)
    assert fc.nmv.comps[0].classes.shape == (10,)
    assert fc.nmv.comps[1].class0_fp.shape == (2, 3)
    assert 0 < fc.nmv.comps[0].sign < 256


def test_prob_cost_shape():
    c = T.prob_cost()
    assert c.shape == (256,)
    assert c[128] == 512  # half prob = 1 bit = 512 units
    assert c[255] < c[128] < c[1]


def test_cat6_extra_bits():
    assert T.cat_probs(T.Token.CAT6).size == 14
    assert T.CAT_BASE[T.Token.CAT6] == 67


def test_subpel_filters_sum_128():
    for f in (T.InterpFilter.EIGHTTAP, T.InterpFilter.EIGHTTAP_SMOOTH,
              T.InterpFilter.EIGHTTAP_SHARP, T.InterpFilter.BILINEAR):
        k = T.subpel_filters(f)
        assert k.shape == (16, 8)
        np.testing.assert_array_equal(k.sum(axis=1), np.full(16, 128))
