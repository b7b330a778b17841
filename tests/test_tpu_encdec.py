"""Device-resident encode path conformance (runs on CPU jax).

The device EncDec step (pipeline/tpu_encdec.py) must produce bitstreams
that decode bit-exactly to the encoder's own (device-computed, device-
loop-filtered) reconstruction — the same oracle contract as the host
path (tests/test_inter_roundtrip.py)."""

import io

import numpy as np
import pytest

from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.pipeline.realtime import RtSession, encode_stream_rt
from tpu_vp9.utils.yuv import synthetic_frames


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def roundtrip_rt(frames, qindex=100, **kw):
    enc = encode_stream_rt(frames, qindex=qindex, **kw)
    buf = io.BytesIO()
    write_ivf_header(buf, frames[0].width, frames[0].height, 30, 1)
    for i, ef in enumerate(enc):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(enc))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    return enc, dec


def check_exact(frames, enc, dec, w, h):
    assert len(dec) == len(frames)
    for i, (ef, (y, u, v, _)) in enumerate(zip(enc, dec)):
        st = ef.state
        np.testing.assert_array_equal(
            y, st.planes[0].recon[:h, :w],
            err_msg=f"frame {i} (key={ef.is_keyframe}) Y mismatch")
        np.testing.assert_array_equal(u, st.planes[1].recon[: (h + 1) // 2,
                                                            : (w + 1) // 2])
        np.testing.assert_array_equal(v, st.planes[2].recon[: (h + 1) // 2,
                                                            : (w + 1) // 2])


def test_rt_roundtrip_aligned():
    # 128x96: mi 16x12, mi_rows % 4 == 0 -> pure 32-grid
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 4, seed=0, motion=True))
    enc, dec = roundtrip_rt(frames, qindex=110)
    check_exact(frames, enc, dec, w, h)
    for fr, (y, _, _, _) in zip(frames[1:], dec[1:]):
        assert psnr(y, fr.y) > 28


def test_rt_roundtrip_ragged_mi3():
    # 160x104: mi_rows = 13 -> % 4 == 1 is rejected; use 120 -> mi 15 (%4==3)
    w, h = 160, 120
    frames = list(synthetic_frames(w, h, 3, seed=1, motion=True))
    enc, dec = roundtrip_rt(frames, qindex=120)
    check_exact(frames, enc, dec, w, h)


def test_rt_roundtrip_strip():
    # 128x112: mi_rows = 14 (%4 == 2) -> 16x16 bottom strip zone
    w, h = 128, 112
    frames = list(synthetic_frames(w, h, 3, seed=2, motion=True))
    enc, dec = roundtrip_rt(frames, qindex=120)
    check_exact(frames, enc, dec, w, h)


def test_rt_odd_64_width():
    # width % 64 == 32 exercises the padded-width loop-filter masks
    w, h = 96, 64
    frames = list(synthetic_frames(w, h, 3, seed=3, motion=True))
    enc, dec = roundtrip_rt(frames, qindex=100)
    check_exact(frames, enc, dec, w, h)


def test_rt_static_scene_mostly_skip():
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 3, seed=4, motion=False))
    enc, dec = roundtrip_rt(frames, qindex=120)
    key = len(enc[0].payload)
    # P frames re-encode residual toward the source (recon != source at
    # this q), so they are small but not empty; sizes shrink as recon
    # converges
    assert all(len(e.payload) < key * 0.45 for e in enc[1:])
    assert len(enc[2].payload) <= len(enc[1].payload)


def test_rt_keyframe_interval():
    w, h = 96, 64
    frames = list(synthetic_frames(w, h, 5, seed=5, motion=True))
    enc, dec = roundtrip_rt(frames, qindex=110, intra_period=1)
    assert [e.is_keyframe for e in enc] == [True, False, True, False, True]
    check_exact(frames, enc, dec, w, h)


@pytest.mark.parametrize("dims", [(128, 96), (128, 112)])
def test_device_lf_matches_host_oracle(dims):
    """Device loop filter == host loop_filter_frame, bit-exact, on SMOOTH
    content (noise planes never trigger the filter masks — vacuous)."""
    import jax
    import jax.numpy as jnp

    from tpu_vp9.bitstream.tables import BlockSize, TxSize
    from tpu_vp9.codec import modeinfo as MI
    from tpu_vp9.codec.intra_frame import walk_partition_fixed
    from tpu_vp9.ops.loopfilter import loop_filter_frame, sharpness_limits
    from tpu_vp9.pipeline.tpu_encdec import loop_filter_device, make_geom

    w, h = dims
    g = make_geom(w, h)
    rng = np.random.default_rng(hash(dims) % 2**31)
    mig = MI.ModeInfoGrid(g.mi_rows, g.mi_cols)
    for ev, r, c, bs, _ in walk_partition_fixed(
            g.mi_rows, g.mi_cols, BlockSize.BLOCK_32X32, 0):
        if ev != "leaf":
            continue
        tx = (TxSize.TX_32X32 if bs == BlockSize.BLOCK_32X32
              else TxSize.TX_16X16)
        mi = MI.ModeInfo(bsize=bs, tx_size=tx,
                         skip=bool(rng.integers(0, 2)), is_inter=True,
                         ref_frame=(1, -1), mv=((0, 0), (0, 0)),
                         inter_mode=int(rng.integers(0, 4)))
        mig.set_block(r, c, bs, mi)

    def smooth(hh, ww):
        base = rng.integers(0, 256, (hh // 8 + 2, ww // 8 + 2)).astype(float)
        up = np.kron(base, np.ones((8, 8)))[:hh, :ww]
        return np.ascontiguousarray(
            np.clip(up + rng.normal(0, 2, (hh, ww)), 0, 255), np.uint8)

    planes = [smooth(g.h_mi, g.w_mi), smooth(g.h_mi // 2, g.w_mi // 2),
              smooth(g.h_mi // 2, g.w_mi // 2)]
    lim_t, mblim_t = sharpness_limits(0)
    for lvl in (11, 34):
        host = [p.copy() for p in planes]
        loop_filter_frame(host, mig, lvl, 0, (1, 0, -1, -1), (0, 0), True)
        dev = [jnp.asarray(np.pad(planes[0],
                                  ((0, g.pad_h - g.h_mi),
                                   (0, g.pad_w - g.w_mi)), mode="edge")),
               jnp.asarray(np.pad(planes[1],
                                  ((0, g.pad_h // 2 - g.h_mi // 2),
                                   (0, g.pad_w // 2 - g.w_mi // 2)),
                                  mode="edge")),
               jnp.asarray(np.pad(planes[2],
                                  ((0, g.pad_h // 2 - g.h_mi // 2),
                                   (0, g.pad_w // 2 - g.w_mi // 2)),
                                  mode="edge"))]
        fn = jax.jit(lambda a, b, c, l, li, mb: loop_filter_device(
            a, b, c, g, l, li, mb))
        oy, ou, ov = fn(dev[0], dev[1], dev[2],
                        jnp.asarray(lvl, jnp.int32),
                        jnp.asarray(int(lim_t[lvl]), jnp.int32),
                        jnp.asarray(int(mblim_t[lvl]), jnp.int32))
        np.testing.assert_array_equal(np.asarray(oy)[: g.h_mi, : g.w_mi],
                                      host[0])
        np.testing.assert_array_equal(
            np.asarray(ou)[: g.h_mi // 2, : g.w_mi // 2], host[1])
        np.testing.assert_array_equal(
            np.asarray(ov)[: g.h_mi // 2, : g.w_mi // 2], host[2])


@pytest.mark.parametrize("er", [False, True])
def test_rt_streams_decode_with_system_libvpx(er):
    # the strongest oracle on the newest code: RT streams (fc-chain +
    # temporal MVs when er=False) must decode bit-exact under the SYSTEM
    # libvpx, not only the self-authored decoder
    from tools.libvpx_oracle import LibvpxDecoder, available

    if not available():
        pytest.skip("system libvpx not present")
    w, h = 128, 112  # strip geometry
    frames = list(synthetic_frames(w, h, 5, seed=7, motion=True))
    enc = encode_stream_rt(frames, qindex=120, error_resilient=er)
    dec = LibvpxDecoder()
    for i, ef in enumerate(enc):
        (y, u, v), = dec.decode(ef.payload)
        st = ef.state
        np.testing.assert_array_equal(y, st.planes[0].recon[:h, :w],
                                      err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(u, st.planes[1].recon[:h >> 1, :w >> 1])
        np.testing.assert_array_equal(v, st.planes[2].recon[:h >> 1, :w >> 1])


def test_rt_fc_chain_saves_bytes():
    # context persistence + adaptation must beat default-probs er coding
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 8, seed=3, motion=True))
    enc_er = encode_stream_rt(frames, qindex=120, error_resilient=True)
    enc_fc = encode_stream_rt(frames, qindex=120, error_resilient=False)
    p_er = sum(len(e.payload) for e in enc_er if not e.is_keyframe)
    p_fc = sum(len(e.payload) for e in enc_fc if not e.is_keyframe)
    assert p_fc < p_er * 0.95, (p_fc, p_er)


def test_public_api_routes_through_rt():
    # VERDICT r2 #1: the device path must be the product — the public
    # Vp9Encoder routes low-delay M8/M9 through RtSession (forced here so
    # it runs under CPU jax), and the streams decode with our decoder
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig, PredStructure

    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 5, seed=11, motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(
        source_width=w, source_height=h, frame_rate=30, qp=32,
        enc_mode=9, intra_period=2, tpu_realtime=2,
        pred_structure=PredStructure.LOW_DELAY_P))
    enc.init()
    assert enc._rt is not None
    for fr in frames:
        enc.send_picture(fr)
    enc.flush()
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    assert len(pkts) == 5
    assert [p.is_keyframe for p in pkts] == [True, False, False, True,
                                             False]
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for i, p in enumerate(pkts):
        write_ivf_frame(buf, p.data, p.pts)
    patch_ivf_frame_count(buf, len(pkts))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == 5
    for i, (y, _, _, _) in enumerate(dec):
        assert psnr(y, frames[i].y) > 30


@pytest.mark.parametrize("dims", [(128, 128), (192, 120)])
def test_device_lf_split_matches_host_oracle(dims):
    """Mixed 32/16 grids: device LF with a split32 mask == host oracle."""
    import jax
    import jax.numpy as jnp

    from tpu_vp9.bitstream.tables import BlockSize, TxSize
    from tpu_vp9.codec import modeinfo as MI
    from tpu_vp9.ops.loopfilter import loop_filter_frame, sharpness_limits
    from tpu_vp9.pipeline.tpu_encdec import loop_filter_device, make_geom

    w, h = dims
    g = make_geom(w, h)
    assert not g.strip
    rng = np.random.default_rng(hash(dims) % 2**31)
    split = rng.integers(0, 2, (g.rows32, g.cols32)).astype(np.int32)
    mig = MI.ModeInfoGrid(g.mi_rows, g.mi_cols)
    for br in range(g.rows32):
        for bc in range(g.cols32):
            r0, c0 = br * 4, bc * 4
            if split[br, bc]:
                for dr in (0, 2):
                    for dc in (0, 2):
                        if r0 + dr >= g.mi_rows or c0 + dc >= g.mi_cols:
                            continue
                        mi = MI.ModeInfo(
                            bsize=BlockSize.BLOCK_16X16,
                            tx_size=TxSize.TX_16X16,
                            skip=bool(rng.integers(0, 2)), is_inter=True,
                            ref_frame=(1, -1), mv=((0, 0), (0, 0)),
                            inter_mode=int(rng.integers(0, 4)))
                        mig.set_block(r0 + dr, c0 + dc,
                                      BlockSize.BLOCK_16X16, mi)
            else:
                mi = MI.ModeInfo(bsize=BlockSize.BLOCK_32X32,
                                 tx_size=TxSize.TX_32X32,
                                 skip=bool(rng.integers(0, 2)),
                                 is_inter=True, ref_frame=(1, -1),
                                 mv=((0, 0), (0, 0)),
                                 inter_mode=int(rng.integers(0, 4)))
                mig.set_block(r0, c0, BlockSize.BLOCK_32X32, mi)

    def smooth(hh, ww):
        base = rng.integers(0, 256, (hh // 8 + 2, ww // 8 + 2)).astype(float)
        up = np.kron(base, np.ones((8, 8)))[:hh, :ww]
        return np.ascontiguousarray(
            np.clip(up + rng.normal(0, 2, (hh, ww)), 0, 255), np.uint8)

    planes = [smooth(g.h_mi, g.w_mi), smooth(g.h_mi // 2, g.w_mi // 2),
              smooth(g.h_mi // 2, g.w_mi // 2)]
    lim_t, mblim_t = sharpness_limits(0)
    for lvl in (13, 37):
        host = [p.copy() for p in planes]
        loop_filter_frame(host, mig, lvl, 0, (1, 0, -1, -1), (0, 0), True)
        dev = [jnp.asarray(np.pad(planes[0],
                                  ((0, g.pad_h - g.h_mi),
                                   (0, g.pad_w - g.w_mi)), mode="edge")),
               jnp.asarray(np.pad(planes[1],
                                  ((0, g.pad_h // 2 - g.h_mi // 2),
                                   (0, g.pad_w // 2 - g.w_mi // 2)),
                                  mode="edge")),
               jnp.asarray(np.pad(planes[2],
                                  ((0, g.pad_h // 2 - g.h_mi // 2),
                                   (0, g.pad_w // 2 - g.w_mi // 2)),
                                  mode="edge"))]
        fn = jax.jit(lambda a, b, c, l, li, mb, sp: loop_filter_device(
            a, b, c, g, l, li, mb, split32=sp))
        oy, ou, ov = fn(dev[0], dev[1], dev[2],
                        jnp.asarray(lvl, jnp.int32),
                        jnp.asarray(int(lim_t[lvl]), jnp.int32),
                        jnp.asarray(int(mblim_t[lvl]), jnp.int32),
                        jnp.asarray(split))
        np.testing.assert_array_equal(np.asarray(oy)[: g.h_mi, : g.w_mi],
                                      host[0], err_msg=f"Y lvl={lvl}")
        np.testing.assert_array_equal(
            np.asarray(ou)[: g.h_mi // 2, : g.w_mi // 2], host[1],
            err_msg=f"U lvl={lvl}")
        np.testing.assert_array_equal(
            np.asarray(ov)[: g.h_mi // 2, : g.w_mi // 2], host[2],
            err_msg=f"V lvl={lvl}")


def test_rt_split16_roundtrip_and_gain():
    # 32-vs-16 partition decision: streams stay bit-exact under both
    # decoders and beat the uniform grid on rate AND distortion on
    # motion-complex content
    from tools.libvpx_oracle import LibvpxDecoder, available

    rng = np.random.default_rng(0)
    w, h = 192, 128
    bg = rng.integers(40, 220, (h * 2, w * 2)).astype(np.uint8)
    bg = (bg[::2, ::2] // 2 + bg[1::2, 1::2] // 2)
    objs = [(rng.integers(0, h - 24), rng.integers(0, w - 24),
             rng.integers(40, 220, (24, 24)).astype(np.uint8))
            for _ in range(6)]
    from tpu_vp9.utils.yuv import Frame420

    frames = []
    for t in range(5):
        y = np.roll(bg, t * 2, axis=1).copy()
        for k, (oy, ox, tex) in enumerate(objs):
            dy = (oy + t * (k % 3 + 1)) % (h - 24)
            dx = (ox + t * ((k + 1) % 4)) % (w - 24)
            y[dy:dy + 24, dx:dx + 24] = tex
        frames.append(Frame420(y=y,
                               u=np.full((h // 2, w // 2), 128, np.uint8),
                               v=np.full((h // 2, w // 2), 128, np.uint8)))

    enc_u = encode_stream_rt(frames, qindex=140, split16=False)
    enc_s = encode_stream_rt(frames, qindex=140, split16=True)
    # self-decoder bit-exact
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for i, ef in enumerate(enc_s):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(enc_s))
    buf.seek(0)
    for ef, (y, u, v, _) in zip(enc_s, decode_ivf(buf)):
        np.testing.assert_array_equal(y, ef.state.planes[0].recon[:h, :w])
    if available():
        dec = LibvpxDecoder()
        for ef in enc_s:
            (y, u, v), = dec.decode(ef.payload)
            np.testing.assert_array_equal(
                y, ef.state.planes[0].recon[:h, :w])
    b_u = sum(len(e.payload) for e in enc_u if not e.is_keyframe)
    b_s = sum(len(e.payload) for e in enc_s if not e.is_keyframe)

    def dsum(enc):
        return sum(np.mean((ef.state.planes[0].recon[:h, :w].astype(float)
                            - fr.y.astype(float)) ** 2)
                   for ef, fr in zip(enc, frames) if not ef.is_keyframe)

    assert b_s < b_u * 0.9, (b_s, b_u)
    assert dsum(enc_s) <= dsum(enc_u) * 1.02


def test_rt_golden_roundtrip():
    """GOLDEN anchor in HBM: per-block LAST/GOLDEN choice, periodic
    refresh (refresh_frame_mask 0x03), entropy-table candidate rates.
    Streams must decode bit-exactly against the device recon."""
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 12, seed=2, motion=True))
    enc, dec = roundtrip_rt(frames, qindex=120, golden=True,
                            golden_interval=4)
    check_exact(frames, enc, dec, w, h)


def test_rt_golden_split16_roundtrip():
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 6, seed=3, motion=True))
    enc, dec = roundtrip_rt(frames, qindex=120, golden=True, split16=True)
    check_exact(frames, enc, dec, w, h)


def test_rt_golden_picks_anchor_on_occlusion():
    """A static background occluded by a moving box for a few frames:
    once the box moves on, GOLDEN (pre-occlusion) predicts the revealed
    area better than LAST; at least one block must choose it."""
    rng = np.random.default_rng(7)
    w, h = 128, 96
    bg = rng.integers(0, 255, (h, w), dtype=np.uint8)
    from tpu_vp9.utils.yuv import Frame420

    frames = []
    for i in range(8):
        y = bg.copy()
        x0 = 8 * i
        y[32:64, x0 : x0 + 32] = 255  # moving occluder
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append(Frame420(y=y, u=u, v=v))
    enc, dec = roundtrip_rt(frames, qindex=60, golden=True,
                            golden_interval=16)
    check_exact(frames, enc, dec, w, h)
    used_golden = False
    for ef in enc[2:]:
        # the native serializer fills the flat field arrays (no
        # per-block objects); GOLDEN = RefFrame id 2
        if (ef.state.mig.f_ref0 == 2).any():
            used_golden = True
    assert used_golden


def test_rt_staged_input_and_async_ser_deterministic():
    """r5: pre-staged device input + the async host-serialization
    worker must produce byte-identical streams run-to-run and against
    the unstaged send path."""
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 6, seed=12, motion=True))

    def run(staged):
        sess = RtSession(w, h, want_recon=False, split16=True,
                         golden=True)
        out = []
        if staged:
            out += sess.send(frames[0], qindex=120)
            for s in [sess.stage(f) for f in frames[1:]]:
                out += sess.send(s, qindex=120)
        else:
            for f in frames:
                out += sess.send(f, qindex=120)
        out += sess.flush()
        return [e.payload for e in out]

    a = run(False)
    b = run(False)
    c = run(True)
    assert a == b == c


def test_rt_aq_tune_sq_roundtrip():
    """r5: per-SB variance-adaptive rate-lambda (QPM analogue, tune SQ)
    must stay conformant."""
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 4, seed=13, motion=True))
    sess = RtSession(w, h, want_recon=True, split16=True, golden=True,
                     aq=True)
    enc = []
    for f in frames:
        enc += sess.send(f, qindex=120)
    enc += sess.flush()
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for i, e in enumerate(enc):
        write_ivf_frame(buf, e.payload, i)
    patch_ivf_frame_count(buf, len(enc))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    check_exact(frames, enc, dec, w, h)
