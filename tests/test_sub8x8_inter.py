"""Sub-8x8 inter blocks (bmi MVs): encoder emission at the quality
presets, in-repo decode bit-exactness, and system-libvpx conformance.

Reference parity target: vp9_bitstream.c:360 write_modes_b bmi branch,
vp9 read_inter_block_mode_info sub-8x8 loop, append_sub8x8_mvs_for_idx.
"""

import io

import numpy as np
import pytest

from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.bitstream.tables import BlockSize
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.utils.yuv import Frame420


def _fine_motion_frames(w, h, n, seed=5):
    """Content whose 4x4 quadrants move independently: neighbouring
    4px stripes translate in opposite directions, so sub-8x8 bmi MVs
    genuinely beat one 8x8 MV."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 32, w + 32), dtype=np.uint8)
    frames = []
    for i in range(n):
        y = np.empty((h, w), np.uint8)
        for s in range(0, h, 4):
            dx = 8 + (i if (s // 4) % 2 == 0 else -i)
            y[s : s + 4] = base[16 + s : 20 + s, 8 + dx : 8 + dx + w]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append(Frame420(y=y, u=u, v=v))
    return frames


def _encode(frames, w, h, enc_mode=1, qp=36):
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig, PredStructure

    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(
        source_width=w, source_height=h, frame_rate=30, qp=qp,
        enc_mode=enc_mode, intra_period=-1, tpu_realtime=0,
        pred_structure=PredStructure.LOW_DELAY_P, hierarchical_levels=0))
    enc.init()
    pkts = []
    for fr in frames:
        enc.send_picture(fr)
        while True:
            p = enc.get_packet()
            if p is None:
                break
            pkts.append(p)
    enc.flush()
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    return pkts


def test_sub8x8_inter_roundtrip_and_emission():
    w, h = 96, 64
    frames = _fine_motion_frames(w, h, 4)
    pkts = _encode(frames, w, h, enc_mode=1)
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for p in pkts:
        write_ivf_frame(buf, p.data, p.pts)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == len(frames)
    # quality sanity
    for fr, (y, _, _, _) in zip(frames[1:], dec[1:]):
        mse = np.mean((y.astype(np.float64) - fr.y.astype(np.float64)) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 25

    # the encoder must actually have used sub-8x8 inter blocks: decode
    # again with set_block instrumented
    from tpu_vp9.decoder import decoder as D

    orig_set_block = D.MI.ModeInfoGrid.set_block
    hits = []

    def spy(self, mi_row, mi_col, bsize, mi):
        if mi.is_inter and bsize < BlockSize.BLOCK_8X8:
            hits.append((mi_row, mi_col, int(bsize)))
        return orig_set_block(self, mi_row, mi_col, bsize, mi)

    D.MI.ModeInfoGrid.set_block = spy
    try:
        buf.seek(0)
        list(decode_ivf(buf))
    finally:
        D.MI.ModeInfoGrid.set_block = orig_set_block
    assert hits, "no sub-8x8 inter blocks were emitted"


def test_sub8x8_inter_recon_bit_exact():
    """Encoder recon must equal the in-repo decoder output exactly."""
    w, h = 96, 64
    frames = _fine_motion_frames(w, h, 3, seed=9)
    from tpu_vp9.bitstream.tables import BlockSize as BS
    from tpu_vp9.pipeline.encoder import encode_stream

    encoded = encode_stream(frames, qindex=120, intra_period=-1,
                            part_depths=(BS.BLOCK_4X4, BS.BLOCK_64X64))
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for i, ef in enumerate(encoded):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(encoded))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    for i, (ef, (y, u, v, _)) in enumerate(zip(encoded, dec)):
        st = ef.state
        np.testing.assert_array_equal(
            y, st.planes[0].recon[:h, :w], err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(
            u, st.planes[1].recon[: h // 2, : w // 2],
            err_msg=f"frame {i} U")
        np.testing.assert_array_equal(
            v, st.planes[2].recon[: h // 2, : w // 2],
            err_msg=f"frame {i} V")


def test_sub8x8_inter_libvpx_conformance():
    from tools.libvpx_oracle import available
    from tools.libvpx_oracle import decode_ivf as lv_decode

    if not available():
        pytest.skip("system libvpx not present")
    w, h = 96, 64
    frames = _fine_motion_frames(w, h, 4, seed=11)
    pkts = _encode(frames, w, h, enc_mode=1)
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1, len(pkts))
    for p in pkts:
        write_ivf_frame(buf, p.data, p.pts)
    dec = lv_decode(buf.getvalue())
    assert len(dec) == len(frames)


def test_4x8_rect_emission_and_decode():
    """Column-stripe motion favours 4X8 rect sub-8x8 blocks; the stream
    must decode (in-repo) and contain 4X8 or 8X4 inter mis."""
    rng = np.random.default_rng(13)
    w, h = 96, 64
    base = rng.integers(0, 255, (h + 32, w + 32), dtype=np.uint8)
    frames = []
    for i in range(4):
        y = np.empty((h, w), np.uint8)
        for s in range(0, w, 4):
            dy = 8 + (i if (s // 4) % 2 == 0 else -i)
            y[:, s : s + 4] = base[8 + dy : 8 + dy + h, 16 + s : 20 + s]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 136, np.uint8)
        frames.append(Frame420(y=y, u=u, v=v))
    pkts = _encode(frames, w, h, enc_mode=1)
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for p in pkts:
        write_ivf_frame(buf, p.data, p.pts)
    patch_ivf_frame_count(buf, len(pkts))

    from tpu_vp9.decoder import decoder as D

    orig_set_block = D.MI.ModeInfoGrid.set_block
    hits = []

    def spy(self, mi_row, mi_col, bsize, mi):
        if mi.is_inter and bsize in (BlockSize.BLOCK_4X8,
                                     BlockSize.BLOCK_8X4):
            hits.append(int(bsize))
        return orig_set_block(self, mi_row, mi_col, bsize, mi)

    D.MI.ModeInfoGrid.set_block = spy
    try:
        buf.seek(0)
        dec = list(decode_ivf(buf))
    finally:
        D.MI.ModeInfoGrid.set_block = orig_set_block
    assert len(dec) == len(frames)
    assert hits, "no 4X8/8X4 inter blocks were emitted"
