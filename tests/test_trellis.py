"""Trellis coefficient optimization (vp9_optimize_b analogue).

(1) The backward DP must never lose to the unoptimized levels under the
exact RD model (token-walk rate + coefficient-domain distortion), on
average over random blocks; (2) end-to-end at M4 it must save bytes at
~equal PSNR, and streams must still decode bit-exact.
"""

import io
import os

import numpy as np
import pytest

from tpu_vp9 import native as nat
from tpu_vp9.bitstream import tables as T
from tpu_vp9.bitstream.tables import TxSize, TxType
from tpu_vp9.bitstream.tokenize import full_probs_for

pytestmark = pytest.mark.skipif(
    nat.get_lib() is None or not hasattr(nat.get_lib(),
                                         "optimize_coeffs_batch"),
    reason="native library unavailable")


def _rd(levels, coeffs, probs, lam, q_dc, q_ac, q_shift, tx):
    """Exact model: token-walk rate (true contexts) + coeff-domain dist."""
    rate = nat.native_coeff_cost_batch(
        levels[None].astype(np.int32), int(tx), int(TxType.DCT_DCT),
        probs, np.asarray([1], np.int32))[0]
    q = np.full(levels.shape, q_ac, np.int64)
    q[0, 0] = q_dc
    deq = (np.abs(levels).astype(np.int64) * q) >> q_shift
    deq = np.where(levels < 0, -deq, deq)
    dist = float(((coeffs - deq) ** 2).sum())
    return dist + lam * float(rate)


@pytest.mark.parametrize("tx,n", [(TxSize.TX_4X4, 4), (TxSize.TX_8X8, 8),
                                  (TxSize.TX_16X16, 16)])
def test_trellis_improves_rd(tx, n):
    rng = np.random.default_rng(3)
    qindex = 120
    dc_q, ac_q = T.dc_quant(qindex), T.ac_quant(qindex)
    probs = np.ascontiguousarray(
        full_probs_for(T.default_frame_context(), tx, False, True),
        np.uint8)
    lam = max(1.0, 0.85 * (ac_q / 8.0) ** 2) * 64.0 / 256.0
    wins = losses = 0
    gain = 0.0
    for trial in range(40):
        # mostly-low-energy residual spectra with a few large coeffs
        coeffs = (rng.normal(0, ac_q * 0.7, (n, n))
                  * (rng.random((n, n)) < 0.3)).astype(np.float32)
        coeffs[0, 0] += rng.normal(0, dc_q)
        from tpu_vp9.ops import txfm

        levels = txfm.quantize_block(coeffs[None], dc_q, ac_q, tx,
                                     bias=0.42)[0].astype(np.int32)
        if not levels.any():
            continue
        before = _rd(levels, coeffs.astype(np.float64), probs, lam,
                     dc_q, ac_q, 0, tx)
        opt = levels.copy()
        nat.native_optimize_coeffs_batch(
            opt[None], coeffs[None], int(tx), int(TxType.DCT_DCT), probs,
            1, lam, dc_q, ac_q, 0)
        after = _rd(opt, coeffs.astype(np.float64), probs, lam,
                    dc_q, ac_q, 0, tx)
        gain += before - after
        if after < before - 1e-9:
            wins += 1
        elif after > before + 1e-9:
            losses += 1
    # the DP prices contexts from the original cache, so individual
    # blocks may occasionally lose a little — but it must win overall
    assert gain > 0
    assert wins > losses


def _encode_m4(frames, trellis: bool):
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig

    os.environ["TPU_VP9_NO_TRELLIS"] = "0" if trellis else "1"
    try:
        enc = Vp9Encoder()
        enc.set_parameter(EncoderConfig(
            source_width=176, source_height=144, frame_rate=30, qp=38,
            enc_mode=4, intra_period=-1, tpu_realtime=0))
        enc.init()
        for fr in frames:
            enc.send_picture(fr)
        enc.flush()
        pkts = []
        while True:
            p = enc.get_packet()
            if p is None:
                break
            pkts.append(p)
        return pkts
    finally:
        os.environ.pop("TPU_VP9_NO_TRELLIS", None)


def test_trellis_saves_bytes_at_m4():
    from tpu_vp9.bitstream.ivf import (
        patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
    )
    from tpu_vp9.decoder.decoder import decode_ivf
    from tpu_vp9.utils.yuv import synthetic_frames

    frames = list(synthetic_frames(176, 144, 6, seed=7, motion=True))
    off = _encode_m4(frames, trellis=False)
    on = _encode_m4(frames, trellis=True)
    b_off = sum(len(p.data) for p in off)
    b_on = sum(len(p.data) for p in on)
    assert b_on < b_off  # strictly fewer bits

    # and the optimized stream still decodes
    buf = io.BytesIO()
    write_ivf_header(buf, 176, 144, 30, 1)
    for p in on:  # packets already in decode order
        write_ivf_frame(buf, p.data, p.pts)
    patch_ivf_frame_count(buf, len(on))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == len(frames)

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    ps_on = np.mean([psnr(y, fr.y) for (y, _, _, _), fr
                     in zip(dec, frames)])
    assert ps_on > 28
