#!/usr/bin/env python
"""Extract VP9-normative constant tables into tpu_vp9/bitstream/vp9_tables.npz.

The VP9 specification mandates exact default probability tables, scan orders,
dequantizer lookup tables, and sub-pel filter kernels; every conformant codec
embeds the identical numbers. Rather than hand-typing thousands of constants
(error-prone), this tool mechanically parses the numeric initializers out of
the BSD-licensed libvpx copies vendored by the reference encoder
(/root/reference/Source/Lib/VPX/*.c) and stores them as numpy arrays.

Only the *numbers* (spec-mandated data) are taken; all code operating on them
in this repo is written from scratch. Run once; the .npz is committed so the
framework is standalone.
"""

from __future__ import annotations

import re
import sys

import numpy as np

VPX = "/root/reference/Source/Lib/VPX"


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def find_initializer(text: str, symbol: str) -> str:
    """Return the brace initializer string for `symbol ... = { ... };`."""
    # Symbol may appear as `name[...]` or `name[..])` (DECLARE_ALIGNED) before '='.
    pat = re.compile(
        re.escape(symbol) + r"(?![A-Za-z0-9_])\s*(\[[^\]]*\])*\s*\)?\s*=\s*\{"
    )
    m = pat.search(text)
    if not m:
        raise KeyError(f"symbol not found: {symbol}")
    start = text.index("{", m.end() - 1)
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    raise ValueError(f"unbalanced braces for {symbol}")


# Enum constants appearing inside tree initializers (values per VP9 spec).
ENUM_SUBST = {
    # intra modes
    "DC_PRED": 0, "V_PRED": 1, "H_PRED": 2, "D45_PRED": 3, "D135_PRED": 4,
    "D117_PRED": 5, "D153_PRED": 6, "D207_PRED": 7, "D63_PRED": 8, "TM_PRED": 9,
    # inter mode offsets (INTER_OFFSET(x) = x - NEARESTMV)
    "INTER_OFFSET(NEARESTMV)": 0, "INTER_OFFSET(NEARMV)": 1,
    "INTER_OFFSET(ZEROMV)": 2, "INTER_OFFSET(NEWMV)": 3,
    # partitions
    "PARTITION_NONE": 0, "PARTITION_HORZ": 1, "PARTITION_VERT": 2,
    "PARTITION_SPLIT": 3,
    # interp filters
    "EIGHTTAP_SMOOTH": 1, "EIGHTTAP_SHARP": 2, "EIGHTTAP": 0,
    # coefficient tokens
    "ZERO_TOKEN": 0, "ONE_TOKEN": 1, "TWO_TOKEN": 2, "THREE_TOKEN": 3,
    "FOUR_TOKEN": 4, "CATEGORY1_TOKEN": 5, "CATEGORY2_TOKEN": 6,
    "CATEGORY3_TOKEN": 7, "CATEGORY4_TOKEN": 8, "CATEGORY5_TOKEN": 9,
    "CATEGORY6_TOKEN": 10, "EOB_TOKEN": 11,
    # mv joints / classes
    "MV_JOINT_ZERO": 0, "MV_JOINT_HNZVZ": 1, "MV_JOINT_HZVNZ": 2,
    "MV_JOINT_HNZVNZ": 3,
    **{f"MV_CLASS_{i}": i for i in range(10, -1, -1)},
}


def subst_enums(init: str) -> str:
    for name in sorted(ENUM_SUBST, key=len, reverse=True):
        init = init.replace(name, str(ENUM_SUBST[name]))
    return init


def parse_nested(init: str):
    """Parse a C brace initializer into nested Python lists of ints."""
    init = subst_enums(init)

    def parse_group(i: int):
        assert init[i] == "{"
        i += 1
        items = []
        while True:
            while i < len(init) and init[i] in " \t\n\r,":
                i += 1
            if init[i] == "}":
                return items, i + 1
            if init[i] == "{":
                sub, i = parse_group(i)
                items.append(sub)
            else:
                m = re.match(r"-?\d+", init[i:])
                if not m:
                    raise ValueError(f"parse error at {init[i:i+40]!r}")
                items.append(int(m.group(0)))
                i += len(m.group(0))

    items, _ = parse_group(0)
    return items


def fill(nested, shape) -> np.ndarray:
    """Fill nested lists into `shape`, zero-padding missing trailing entries
    (C initializer semantics)."""
    arr = np.zeros(shape, dtype=np.int64)

    def rec(node, out):
        if isinstance(node, list):
            if out.ndim == 0:
                raise ValueError("nesting deeper than shape")
            flat_scalars = all(not isinstance(x, list) for x in node)
            if flat_scalars and out.ndim >= 1 and len(node) > out.shape[0]:
                # Flat list spanning multiple dims (e.g. 2D declared, written flat)
                vals = np.array(node, dtype=np.int64)
                out.reshape(-1)[: vals.size] = vals
                return
            for idx, child in enumerate(node):
                if isinstance(child, list):
                    rec(child, out[idx])
                else:
                    out.reshape(out.shape[0], -1)[idx, 0] if False else None
                    # scalar at this level
                    flat = out[idx]
                    if flat.ndim == 0:
                        out[idx] = child
                    else:
                        flat.reshape(-1)[0] = child
        else:
            out.reshape(-1)[0] = node

    rec(nested, arr)
    return arr


def flatten(nested):
    out = []

    def rec(n):
        if isinstance(n, list):
            for x in n:
                rec(x)
        else:
            out.append(n)

    rec(nested)
    return out


def extract(text: str, symbol: str, shape=None, flat=False) -> np.ndarray:
    nested = parse_nested(find_initializer(text, symbol))
    if flat or shape is None:
        vals = np.array(flatten(nested), dtype=np.int64)
        return vals if shape is None else vals.reshape(shape)
    return fill(nested, shape)


def main() -> None:
    out = {}

    def load(path):
        with open(f"{VPX}/{path}") as fh:
            return strip_comments(fh.read())

    em = load("vp9_entropymode.c")
    out["kf_y_mode_probs"] = extract(em, "eb_vp9_kf_y_mode_prob", (10, 10, 9))
    out["kf_uv_mode_probs"] = extract(em, "eb_vp9_kf_uv_mode_prob", (10, 9))
    out["default_if_y_probs"] = extract(em, "default_if_y_probs", (4, 9))
    out["default_if_uv_probs"] = extract(em, "default_if_uv_probs", (10, 9))
    out["kf_partition_probs"] = extract(em, "eb_vp9_kf_partition_probs", (16, 3))
    out["default_partition_probs"] = extract(em, "default_partition_probs", (16, 3))
    out["default_inter_mode_probs"] = extract(em, "default_inter_mode_probs", (7, 3))
    out["intra_mode_tree"] = extract(em, "eb_vp9_intra_mode_tree")
    out["inter_mode_tree"] = extract(em, "eb_vp9_inter_mode_tree")
    out["partition_tree"] = extract(em, "eb_vp9_partition_tree")
    out["default_intra_inter_prob"] = extract(em, "default_intra_inter_p")
    out["default_comp_inter_prob"] = extract(em, "default_comp_inter_p")
    out["default_comp_ref_prob"] = extract(em, "default_comp_ref_p")
    out["default_single_ref_prob"] = extract(em, "default_single_ref_p", (5, 2))
    tx_flat = extract(em, "default_tx_probs")
    assert tx_flat.size == 12, tx_flat
    out["default_tx_probs_32x32"] = tx_flat[0:6].reshape(2, 3)
    out["default_tx_probs_16x16"] = tx_flat[6:10].reshape(2, 2)
    out["default_tx_probs_8x8"] = tx_flat[10:12].reshape(2, 1)
    out["default_skip_probs"] = extract(em, "default_skip_probs")
    out["default_switchable_interp_probs"] = extract(
        em, "default_switchable_interp_prob", (4, 2)
    )
    out["switchable_interp_tree"] = extract(em, "eb_vp9_switchable_interp_tree")

    en = load("vp9_entropy.c")
    out["coef_con_tree"] = extract(en, "eb_vp9_coef_con_tree")
    for c in range(1, 7):
        out[f"cat{c}_prob"] = extract(en, f"eb_vp9_cat{c}_prob")
    out["coefband_trans_8x8plus"] = extract(en, "eb_vp9_coefband_trans_8x8plus")
    out["coefband_trans_4x4"] = extract(en, "eb_vp9_coefband_trans_4x4")
    out["pt_energy_class"] = extract(en, "eb_vp9_pt_energy_class")
    out["pareto8_full"] = extract(en, "eb_vp9_pareto8_full", (255, 8), flat=True)
    for sz in ("4x4", "8x8", "16x16", "32x32"):
        out[f"default_coef_probs_{sz}"] = extract(
            en, f"default_coef_probs_{sz}", (2, 2, 6, 6, 3)
        )

    sc = load("vp9_scan.c")
    for sz, n in (("4x4", 16), ("8x8", 64), ("16x16", 256), ("32x32", 1024)):
        out[f"default_scan_{sz}"] = extract(sc, f"default_scan_{sz}", (n,))
        out[f"default_scan_{sz}_neighbors"] = extract(
            sc, f"default_scan_{sz}_neighbors", ((n + 1) * 2,)
        )
        if sz != "32x32":
            for o in ("col", "row"):
                out[f"{o}_scan_{sz}"] = extract(sc, f"{o}_scan_{sz}", (n,))
                out[f"{o}_scan_{sz}_neighbors"] = extract(
                    sc, f"{o}_scan_{sz}_neighbors", ((n + 1) * 2,)
                )

    qc = load("vp9_quant_common.c")
    out["dc_qlookup"] = extract(qc, "dc_qlookup", (256,))
    out["ac_qlookup"] = extract(qc, "ac_qlookup", (256,))

    fl = load("vp9_filter.c")
    out["bilinear_filters"] = extract(fl, "bilinear_filters", (16, 8))
    out["sub_pel_filters_8"] = extract(fl, "sub_pel_filters_8", (16, 8))
    out["sub_pel_filters_8s"] = extract(fl, "sub_pel_filters_8s", (16, 8))
    out["sub_pel_filters_8lp"] = extract(fl, "sub_pel_filters_8lp", (16, 8))

    mv = load("vp9_entropymv.c")
    out["mv_joint_tree"] = extract(mv, "eb_vp9_mv_joint_tree")
    out["mv_class_tree"] = extract(mv, "eb_vp9_mv_class_tree")
    out["mv_class0_tree"] = extract(mv, "eb_vp9_mv_class0_tree")
    out["mv_fp_tree"] = extract(mv, "eb_vp9_mv_fp_tree")
    nmv = extract(mv, "default_nmv_context")
    # layout: joints[3], then per component (v,h):
    #   sign, classes[9], class0[0]? -- see nmv_context struct
    out["default_nmv_flat"] = nmv

    ct = load("vp9_cost.c")
    out["prob_cost"] = extract(ct, "eb_vp9_prob_cost", (256,))

    se = load("vp9_subexp.c")
    out["subexp_map_table"] = extract(se, "map_table", (254,))

    np.savez_compressed("tpu_vp9/bitstream/vp9_tables.npz", **out)
    total = sum(v.size for v in out.values())
    print(f"wrote {len(out)} tables, {total} values")
    # quick sanity prints
    print("dc_qlookup[0,255] =", out["dc_qlookup"][0], out["dc_qlookup"][255])
    print("ac_qlookup[0,255] =", out["ac_qlookup"][0], out["ac_qlookup"][255])
    print("nmv flat size =", nmv.size)
    print("coef_probs_4x4[0,0,0,0] =", out["default_coef_probs_4x4"][0, 0, 0, 0])
    print("pareto8_full[0] =", out["pareto8_full"][0])
    print("scan default_4x4 =", out["default_scan_4x4"])


if __name__ == "__main__":
    sys.exit(main())
