"""Hierarchical (random-access) ALTREF-pyramid GOP tests.

Conformance oracle: every produced stream must decode with the in-repo
spec decoder and the decoded planes must bit-match the encoder's own
reconstruction, in display order (SURVEY.md §4 determinism/conformance
strategy).
"""

import io

import numpy as np
import pytest

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.bitstream.headers import build_superframe, split_superframe
from tpu_vp9.bitstream.ivf import write_ivf_frame, write_ivf_header
from tpu_vp9.config import EncoderConfig, PredStructure
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.pipeline.gop import layer_qindex, plan_minigop
from tpu_vp9.utils.yuv import synthetic_frames


def test_split_superframe_roundtrip():
    frames = [b"\x11" * 300, b"\x22" * 7, b"\x33" * 70000]
    packed = build_superframe(frames)
    assert split_superframe(packed) == frames
    single = b"\x44" * 99
    assert split_superframe(single) == [single]
    assert split_superframe(build_superframe([single])) == [single]


@pytest.mark.parametrize("gop_len", [1, 2, 4, 8, 16])
def test_plan_minigop_valid(gop_len):
    base, golden = 10, 6
    plan = plan_minigop(base, gop_len, golden)
    decoded = {base, golden}
    shown = []
    for gf in plan:
        if gf.show_existing_poc >= 0:
            assert gf.show_existing_poc in decoded
            shown.append(gf.poc)
            continue
        # every reference must already be decoded
        for p in (gf.last_poc, gf.golden_poc, gf.alt_poc):
            assert p < 0 or p in decoded
        decoded.add(gf.poc)
        if gf.show:
            shown.append(gf.poc)
    # display order is exactly base+1 .. base+gop_len
    assert shown == list(range(base + 1, base + gop_len + 1))


def test_layer_qindex_monotone():
    for q in (20, 80, 160, 240):
        qs = [layer_qindex(q, l, 5) for l in range(5)]
        assert qs[0] < q  # anchors boosted
        assert qs[-1] >= q  # leaves penalized
        assert all(1 <= v <= 255 for v in qs)


def _encode_decode(N, cfg_kwargs, W=176, H=144, force_key_at=()):
    frames = list(synthetic_frames(W, H, N, seed=0, motion=True))
    cfg = EncoderConfig(source_width=W, source_height=H, **cfg_kwargs)
    enc = Vp9Encoder()
    enc.set_parameter(cfg)
    enc.init()
    assert enc._ra is not None
    enc._ra.keep_recon = True
    for i, f in enumerate(frames):
        enc.send_picture(f, force_keyframe=i in force_key_at)
    enc.flush()
    buf = io.BytesIO()
    write_ivf_header(buf, W, H, 30, 1)
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
        write_ivf_frame(buf, p.data, p.pts)
    assert [p.pts for p in pkts] == list(range(N))  # display order, 1:1
    buf.seek(0)
    outs = list(decode_ivf(buf))
    assert len(outs) == N
    mism = 0
    psnr = []
    for i, (y, u, v, h) in enumerate(outs):
        ry, ru, rv = enc._ra.recon_log[i]
        mism += int((y != ry).sum() + (u != ru).sum() + (v != rv).sum())
        mse = np.mean((y.astype(np.float64) - frames[i].y) ** 2)
        psnr.append(10 * np.log10(255**2 / max(mse, 1e-9)))
    return mism, psnr, pkts


def test_ra_pyramid_bitexact_default():
    mism, psnr, pkts = _encode_decode(13, dict(qp=40, enc_mode=8))
    assert mism == 0
    assert np.mean(psnr) > 30
    assert pkts[0].is_keyframe


def test_ra_pyramid_bitexact_er():
    mism, psnr, _ = _encode_decode(
        9, dict(qp=44, enc_mode=8, error_resilient=True,
                hierarchical_levels=2))
    assert mism == 0


def test_ra_intra_period_and_forced_key():
    # keys at 0, 8 (period) and a forced key at 5
    mism, psnr, pkts = _encode_decode(
        12, dict(qp=42, enc_mode=8, intra_period=7, hierarchical_levels=3),
        force_key_at=(5,))
    assert mism == 0
    keys = [p.pts for p in pkts if p.is_keyframe]
    assert keys == [0, 5, 8]


def test_ra_small_levels():
    for lv in (1, 2, 3):
        mism, _, _ = _encode_decode(
            8, dict(qp=45, enc_mode=8, hierarchical_levels=lv))
        assert mism == 0


def test_compound_prediction_bitexact():
    """Noisy content makes past+future averaging win: compound blocks must
    be chosen, serialized (reference mode SELECT/COMPOUND), and decode
    bit-exactly (incl. sign-bias MV scaling both sides)."""
    from tpu_vp9.utils.yuv import Frame420

    W, H, N = 176, 144, 9
    rng = np.random.default_rng(7)
    frames = []
    for f in synthetic_frames(W, H, N, seed=0, motion=True):
        y = np.clip(f.y.astype(np.int16)
                    + rng.integers(-6, 7, f.y.shape), 0, 255).astype(np.uint8)
        frames.append(Frame420(y=y, u=f.u, v=f.v))
    cfg = EncoderConfig(source_width=W, source_height=H, qp=40, enc_mode=8,
                        hierarchical_levels=3)
    enc = Vp9Encoder()
    enc.set_parameter(cfg)
    enc.init()
    enc._ra.keep_recon = True
    for f in frames:
        enc.send_picture(f)
    enc.flush()
    buf = io.BytesIO()
    write_ivf_header(buf, W, H, 30, 1)
    while True:
        p = enc.get_packet()
        if p is None:
            break
        write_ivf_frame(buf, p.data, p.pts)
    buf.seek(0)
    mism = 0
    modes = set()
    from tpu_vp9.bitstream.headers import split_superframe
    from tpu_vp9.decoder.decoder import parse_uncompressed_header

    for i, (y, u, v, h) in enumerate(decode_ivf(buf)):
        ry, ru, rv = enc._ra.recon_log[i]
        mism += int((y != ry).sum() + (u != ru).sum() + (v != rv).sum())
    assert mism == 0
    # at least one frame must carry compound prediction
    buf.seek(0)
    from tpu_vp9.bitstream.ivf import read_ivf
    from tpu_vp9.decoder import decoder as D

    n_comp_frames = 0
    for pkt in read_ivf(buf):
        for sub in split_superframe(pkt.payload):
            hdr, hs, fp = parse_uncompressed_header(sub)
            if hdr.show_existing_frame or hdr.is_keyframe:
                continue
            fc = __import__("tpu_vp9.bitstream.tables",
                            fromlist=["t"]).default_frame_context()
            D.parse_compressed_header(hdr, sub[hs : hs + fp], fc)
            if hdr.reference_mode != 0:
                n_comp_frames += 1
    assert n_comp_frames >= 1
