"""Mixed (per-row width/level) edge filter must equal scalar calls."""

import numpy as np

from tpu_vp9.ops import loopfilter as LF


def test_mixed_equals_scalar():
    rng = np.random.default_rng(0)
    lim, mblim = LF.sharpness_limits(0)
    n = 64
    base = rng.integers(40, 220, (n, 1))
    line = (base + rng.integers(-2, 3, (n, 16))).astype(np.int32)
    line[::7] = rng.integers(0, 256, (line[::7].shape))  # some busy rows
    widths = np.zeros(n, np.int32)
    lvls = np.zeros(n, np.int32)
    for b in range(0, n, 8):
        widths[b : b + 8] = rng.choice([0, 4, 8, 16])
        lvls[b : b + 8] = rng.choice([0, 8, 24, 48])
    widths[lvls == 0] = 0

    p = [line[:, 7 - k].copy() for k in range(8)]
    q = [line[:, 8 + k].copy() for k in range(8)]
    mp, mq = LF.filter_edge([a.copy() for a in p], [a.copy() for a in q],
                            widths, lvls, lim, mblim)
    # scalar reference per band
    sp = [a.copy() for a in p]
    sq = [a.copy() for a in q]
    for b in range(0, n, 8):
        w, l = int(widths[b]), int(lvls[b])
        if w == 0 or l == 0:
            continue
        taps = 8 if w == 16 else 4
        bp = [a[b : b + 8] for a in sp[:taps]]
        bq = [a[b : b + 8] for a in sq[:taps]]
        op, oq = LF.filter_edge(bp, bq, w, l, lim, mblim)
        for k, arr in enumerate(op):
            sp[k][b : b + 8] = arr
        for k, arr in enumerate(oq):
            sq[k][b : b + 8] = arr
    for k in range(8):
        got_p = mp[k] if k < len(mp) else p[k]
        np.testing.assert_array_equal(got_p, sp[k], err_msg=f"p{k}")
        got_q = mq[k] if k < len(mq) else q[k]
        np.testing.assert_array_equal(got_q, sq[k], err_msg=f"q{k}")
