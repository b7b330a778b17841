"""2-layer low-delay hierarchy: non-reference enhancement frames."""

import io

import numpy as np

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.config import EncoderConfig, PredStructure, PredStructure
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.utils.yuv import synthetic_frames


def encode(frames, pred=PredStructure.LOW_DELAY_P, qp=40, levels=-1):
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=96, source_height=80,
                                    frame_rate=30, qp=qp, enc_mode=8,
                                    pred_structure=pred,
                                    hierarchical_levels=levels))
    enc.init()
    pkts, recons = [], []
    for fr in frames:
        enc.send_picture(fr)
        pkts.append(enc.get_packet())
        recons.append(enc.get_recon())
    buf = io.BytesIO()
    write_ivf_header(buf, 96, 80, 30, 1)
    for i, p in enumerate(pkts):
        write_ivf_frame(buf, p.data, i)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    return pkts, recons, list(decode_ivf(buf))


def test_two_layer_roundtrip_and_structure():
    frames = list(synthetic_frames(96, 80, 7, seed=0, motion=True))
    pkts, recons, dec = encode(frames)
    # layer structure: even frames after the key are non-reference with
    # higher qindex (the frame right after a key is base so dropped-frame
    # decodes see the same last_frame_type sequence)
    assert dec[2][3].refresh_frame_mask == 0  # non-ref
    assert dec[1][3].refresh_frame_mask != 0  # base
    assert pkts[2].qindex > pkts[1].qindex
    # bit-exact decode incl. the slot-0 skip over non-ref frames
    for i, ((y, u, v, h), (ry, ru, rv)) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(y, ry, err_msg=f"frame {i}")


def test_two_layer_not_worse_quality():
    frames = list(synthetic_frames(96, 80, 9, seed=1, motion=True))
    pkts_h, _, dec_h = encode(frames, PredStructure.LOW_DELAY_P)
    pkts_f, _, dec_f = encode(frames, PredStructure.LOW_DELAY_P, levels=0)  # flat

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99 if mse == 0 else 10 * np.log10(255**2 / mse)

    bits_h = sum(len(p.data) for p in pkts_h)
    bits_f = sum(len(p.data) for p in pkts_f)
    p_h = np.mean([psnr(d[0], f.y) for d, f in zip(dec_h, frames)])
    p_f = np.mean([psnr(d[0], f.y) for d, f in zip(dec_f, frames)])
    # temporal scalability costs some efficiency (longer base prediction
    # distance); bound the tradeoff
    assert bits_h < bits_f * 1.6
    assert p_h > p_f - 1.5
    # every other frame is droppable: decoding only base frames must work
    # (non-ref frames never enter the DPB)
    import io as _io
    from tpu_vp9.bitstream.ivf import (
        write_ivf_header as _wh, write_ivf_frame as _wf,
        patch_ivf_frame_count as _pc,
    )
    buf = _io.BytesIO()
    _wh(buf, 96, 80, 30, 1)
    kept_idx = [i for i, p in enumerate(pkts_h)
                if i == 0 or i % 2 == 1]  # key + base layer
    for k, i in enumerate(kept_idx):
        _wf(buf, pkts_h[i].data, k)
    _pc(buf, len(kept_idx))
    buf.seek(0)
    dec_base = list(decode_ivf(buf))
    assert len(dec_base) == len(kept_idx)
    # dropping enhancement frames must not perturb base-layer decode:
    # recon stays bit-exact vs the full-stream decode
    full = {i: d for i, d in enumerate(dec_h)}
    for k, i in enumerate(kept_idx):
        np.testing.assert_array_equal(dec_base[k][0], full[i][0],
                                      err_msg=f"base frame {i}")
