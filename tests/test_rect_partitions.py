"""HORZ/VERT (rectangular) partition decisions in the inter RDO.

The reference evaluates H/V partitions in its 681-entry EP-block
geometry (EbCodingUnit / EbModeDecision); here the open-loop partition
tree probes them as two-half SAD candidates.  Conformance oracle: the
stream must roundtrip bit-exact through the in-repo spec decoder.
"""

import numpy as np

from tpu_vp9.bitstream.headers import FrameHeader, assemble_frame
from tpu_vp9.bitstream.tables import BlockSize, Partition, TxMode
from tpu_vp9.codec.inter_frame import decide_partition_tree, encode_pframe
from tpu_vp9.codec.intra_frame import encode_keyframe
from tpu_vp9.decoder.decoder import decode_frame
from tpu_vp9.ops.inter import extend_borders
from tpu_vp9.utils.yuv import synthetic_frames


def _make_refs(st, w, h):
    refs = []
    for pidx in range(3):
        pl = st.planes[pidx]
        ss = pl.subsampling
        refs.append(extend_borders(pl.recon,
                                   (w + ss) >> ss, (h + ss) >> ss))
    return refs


def test_partition_tree_emits_rect_on_directional_content():
    """A horizontal band moving vertically favors HORZ partitioning."""
    rng = np.random.default_rng(3)
    w, h = 128, 128
    base = rng.integers(80, 120, (h, w)).astype(np.uint8)
    prev = base.copy()
    cur = base.copy()
    # band below row 32 moves, above is static: the row-32 boundary cuts
    # every 64x64 SB in half -> HORZ (top half ZERO-cheap, bottom needs
    # motion) beats both NONE and SPLIT
    cur[32:, :] = np.roll(prev[32:, :], 7, axis=1)
    cur[32:, :7] = rng.integers(0, 255, (h - 32, 7))

    from tpu_vp9.codec.inter_frame import make_frame_state

    frame = type("F", (), {})()
    frame.y = cur
    frame.u = np.full((h // 2, w // 2), 128, np.uint8)
    frame.v = np.full((h // 2, w // 2), 128, np.uint8)
    st = make_frame_state(frame, h // 8, w // 8)
    refs = [extend_borders(prev, w, h),
            extend_borders(frame.u, w // 2, h // 2),
            extend_borders(frame.v, w // 2, h // 2)]
    events = decide_partition_tree(st, refs, 100, 16,
                                   BlockSize.BLOCK_8X8,
                                   BlockSize.BLOCK_64X64)
    parts = [ev for ev in events if ev[0] == "part"]
    rect = [ev for ev in parts if ev[4] in (Partition.HORZ, Partition.VERT)]
    assert rect, "expected at least one rectangular partition"
    # rect leaves must carry rectangular block sizes
    from tpu_vp9.bitstream import tables as T

    leaf_sizes = {ev[3] for ev in events if ev[0] == "leaf"}
    assert any(T.BLOCK_WH[b][0] != T.BLOCK_WH[b][1] for b in leaf_sizes)


def test_rect_partition_stream_roundtrips():
    """P-frames with rect-partition RDO decode bit-exact vs encoder recon
    (full path: prob updates + loop filter, via encode_stream)."""
    import io

    from tpu_vp9.bitstream.ivf import (
        patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
    )
    from tpu_vp9.decoder.decoder import decode_ivf
    from tpu_vp9.pipeline.encoder import encode_stream

    frames = list(synthetic_frames(128, 96, 4, seed=5, motion=True))
    w, h = 128, 96
    enc = encode_stream(frames, qindex=80,
                        part_depths=(BlockSize.BLOCK_8X8,
                                     BlockSize.BLOCK_64X64))
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for i, ef in enumerate(enc):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(enc))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == len(frames)
    # rect leaves must appear in at least one P frame's mode-info grid
    from tpu_vp9.bitstream import tables as T

    saw_rect = False
    for ef in enc[1:]:
        for mi in {id(m): m for m in ef.state.mig.grid.reshape(-1)
                   if m is not None}.values():
            bw, bh = T.BLOCK_WH[mi.bsize]
            if bw != bh:
                saw_rect = True
    assert saw_rect, "expected rectangular leaves in the P frames"
    for i, (ef, (y, u, v, _)) in enumerate(zip(enc, dec)):
        st = ef.state
        np.testing.assert_array_equal(y, st.planes[0].recon[:h, :w],
                                      err_msg=f"frame {i}")
        np.testing.assert_array_equal(u, st.planes[1].recon[:h // 2,
                                                            :w // 2])
        np.testing.assert_array_equal(v, st.planes[2].recon[:h // 2,
                                                            :w // 2])


def test_native_rect_kernels_match_python(monkeypatch):
    """Rect MC+SAD / full-pel search / subpel refine vs Python oracles."""
    import pytest

    import tpu_vp9.native as nat
    from tpu_vp9.ops import inter as inter_ops
    from tpu_vp9.ops import me as me_ops
    from tpu_vp9.ops.inter import BORDER

    if nat.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    w, h = 128, 96
    mi_rows, mi_cols = h // 8, w // 8
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    plane = ((plane.astype(np.int32) + np.roll(plane, 1, 0)) // 2
             ).astype(np.uint8)
    ref = extend_borders(plane, w, h)
    src_full = rng.integers(0, 256, (h, w)).astype(np.uint8)
    for mi_row, mi_col, bw, bh, mv in (
            (0, 0, 16, 8, (5, -3)), (2, 4, 32, 16, (-17, 9)),
            (4, 0, 8, 16, (0, 0)), (0, 8, 16, 32, (999, -999))):
        if mi_row * 8 + bh > h or mi_col * 8 + bw > w:
            continue
        src = src_full[mi_row * 8 : mi_row * 8 + bh,
                       mi_col * 8 : mi_col * 8 + bw]
        pred = inter_ops.predict_inter_block(
            ref, mi_row, mi_col, 0, 0, bw, bh, mv, 0, mi_rows, mi_cols)
        want = int(np.abs(pred.astype(np.int32)
                          - src.astype(np.int32)).sum())
        got = nat.native_mc_sad(ref, BORDER, mi_row, mi_col, bw, bh, mv,
                                mi_rows, mi_cols, src)
        assert got == want, (mi_row, mi_col, bw, bh, mv)
    # full-pel search: native vs numpy fallback path
    src = src_full[8:24, 16:48]  # 16x32
    got = me_ops.full_pel_search(src, ref, 16, 8, BORDER, 8)
    monkeypatch.setattr(nat, "native_sad_search_rect", lambda *a: None)
    want = me_ops.full_pel_search(src, ref, 16, 8, BORDER, 8)
    monkeypatch.undo()
    assert got == want
    # subpel refine: native vs python fallback path
    filters = __import__("tpu_vp9.bitstream.tables",
                         fromlist=["x"]).subpel_filters(
        __import__("tpu_vp9.bitstream.tables",
                   fromlist=["x"]).InterpFilter.EIGHTTAP)
    src2 = np.ascontiguousarray(plane[9:25, 18:50])
    got = me_ops.subpel_refine(src2, ref, 18, 8, BORDER, (1, 2), filters)
    monkeypatch.setattr(nat, "native_subpel_refine_rect",
                        lambda *a, **k: None)
    want = me_ops.subpel_refine(src2, ref, 18, 8, BORDER, (1, 2), filters)
    monkeypatch.undo()
    assert got == want


def test_intra_partition_tree_roundtrip_and_rq():
    """Variance-quadtree keyframe partitioning: mixed sizes, bit-exact
    decode, and better RQ than fixed-size on mixed content."""
    rng = np.random.default_rng(0)
    h, w = 288, 352
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 40 * np.sin(yy / 60) + 20 * np.cos(xx / 80)).astype(np.uint8)
    y[100:200, 100:240] = rng.integers(0, 255, (100, 140))  # heavy texture
    y[40:48, :] = 255
    y[44, :] = 0  # sharp band
    fr = type("F", (), {})()
    fr.y = y
    fr.u = np.full((h // 2, w // 2), 128, np.uint8)
    fr.v = fr.u.copy()

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255**2 / max(mse, 1e-9))

    tile_f, st_f = encode_keyframe(fr, 60, BlockSize.BLOCK_16X16)
    tile_t, st_t = encode_keyframe(
        fr, 60, part_depths=(BlockSize.BLOCK_8X8, BlockSize.BLOCK_64X64))
    p_f = psnr(y, st_f.planes[0].recon[:h, :w])
    p_t = psnr(y, st_t.planes[0].recon[:h, :w])
    # RD-fair check (BD rule of thumb: 1 dB ~ 20% rate): the byte saving
    # must outweigh any PSNR drop at that exchange rate
    saved_frac = 1.0 - len(tile_t) / len(tile_f)
    assert saved_frac > (p_f - p_t) / 5.0, (len(tile_f), len(tile_t),
                                            p_f, p_t)
    # mixed leaf sizes chosen
    sizes = {m.bsize for m in st_t.mig.grid.reshape(-1) if m is not None}
    assert len(sizes) >= 2
    # conformance: decode bit-exact
    hdr = FrameHeader(width=w, height=h, is_keyframe=True,
                      error_resilient=True, base_qindex=60,
                      tx_mode=TxMode.ALLOW_32X32)
    payload = assemble_frame(hdr, tile_t, st_t.header_updates)
    yd, ud, vd, _ = decode_frame(payload, dpb=[None] * 8)
    np.testing.assert_array_equal(yd, st_t.planes[0].recon[:h, :w])


def test_sub8x8_intra_roundtrip_and_rq():
    """BLOCK_4X4 keyframe leaves (4 bmi sub-modes): bit-exact decode and
    RD improvement over an 8x8-min partition tree on detailed content."""
    import io

    from tpu_vp9.bitstream.ivf import (
        patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
    )
    from tpu_vp9.decoder.decoder import decode_ivf
    from tpu_vp9.pipeline.encoder import encode_stream

    rng = np.random.default_rng(0)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 40 * np.sin(yy / 50) + 20 * np.cos(xx / 70)).astype(np.uint8)
    y[30:70, 40:100] = rng.integers(0, 255, (40, 60))
    fr = type("F", (), {})()
    fr.y = y
    fr.u = np.full((h // 2, w // 2), 128, np.uint8)
    fr.v = fr.u.copy()

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255**2 / max(mse, 1e-9))

    results = {}
    for minbs in (BlockSize.BLOCK_8X8, BlockSize.BLOCK_4X4):
        enc = encode_stream([fr], qindex=60,
                            part_depths=(minbs, BlockSize.BLOCK_64X64))
        buf = io.BytesIO()
        write_ivf_header(buf, w, h, 30, 1)
        write_ivf_frame(buf, enc[0].payload, 0)
        patch_ivf_frame_count(buf, 1)
        buf.seek(0)
        yd, ud, vd, _ = next(iter(decode_ivf(buf)))
        st = enc[0].state
        np.testing.assert_array_equal(yd, st.planes[0].recon[:h, :w])
        np.testing.assert_array_equal(ud, st.planes[1].recon[:h // 2,
                                                             :w // 2])
        results[minbs] = (len(enc[0].payload), psnr(y, yd), st)
    b8, p8, _ = results[BlockSize.BLOCK_8X8]
    b4, p4, st4 = results[BlockSize.BLOCK_4X4]
    # 4x4 leaves must actually be chosen on this content
    n4 = sum(1 for m in {id(m): m for m in st4.mig.grid.reshape(-1)
                         if m is not None}.values()
             if m.bsize == BlockSize.BLOCK_4X4)
    assert n4 > 0
    # RD-fair: byte saving outweighs any PSNR drop (1 dB ~ 20% rate)
    saved = 1.0 - b4 / b8
    assert saved > (p8 - p4) / 5.0, (b8, b4, p8, p4)


def test_sub8x8_sub_modes_differ_within_block():
    """The per-4x4 bmi search must pick distinct modes when content
    demands it (not a single block-wide mode)."""
    from tpu_vp9.codec.intra_frame import encode_keyframe

    rng = np.random.default_rng(2)
    h, w = 64, 64
    # alternating horizontal/vertical stripe texture at 4px scale: each
    # 4x4 sub-block wants a different directional predictor
    y = np.zeros((h, w), np.uint8)
    for by in range(0, h, 4):
        for bx in range(0, w, 4):
            if ((by ^ bx) >> 2) & 1:
                y[by : by + 4, bx : bx + 4] = (
                    np.arange(4, dtype=np.uint8) * 60)[None, :]
            else:
                y[by : by + 4, bx : bx + 4] = (
                    np.arange(4, dtype=np.uint8) * 60)[:, None]
    y = np.clip(y.astype(np.int32)
                + rng.integers(-8, 9, y.shape), 0, 255).astype(np.uint8)
    fr = type("F", (), {})()
    fr.y = y
    fr.u = np.full((h // 2, w // 2), 128, np.uint8)
    fr.v = fr.u.copy()
    _, st = encode_keyframe(
        fr, 40, part_depths=(BlockSize.BLOCK_4X4, BlockSize.BLOCK_64X64))
    varied = False
    for m in {id(m): m for m in st.mig.grid.reshape(-1)
              if m is not None}.values():
        if m.bsize == BlockSize.BLOCK_4X4 and len(set(m.sub_modes)) > 1:
            varied = True
    assert varied


def test_sub8x8_at_alignment_overhang():
    """Sub-8x8 leaves whose right/bottom 4x4 columns fall in the
    alignment overhang (crop not an 8px multiple) must encode and decode
    (regression: build_ref_samples crashed when a 4x4 sub-block started
    past the crop edge)."""
    import io

    from tpu_vp9.bitstream.ivf import (
        patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
    )
    from tpu_vp9.decoder.decoder import decode_ivf
    from tpu_vp9.pipeline.encoder import encode_stream

    rng = np.random.default_rng(3)
    w, h = 130, 66  # last mi col/row extend past the crop by 6/2 px
    y = rng.integers(0, 255, (h, w)).astype(np.uint8)
    fr = type("F", (), {})()
    fr.y = y
    fr.u = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
    fr.v = fr.u.copy()
    enc = encode_stream([fr], qindex=45,
                        part_depths=(BlockSize.BLOCK_4X4,
                                     BlockSize.BLOCK_64X64))
    # 4x4 leaves must exist on this content (noise splits everywhere)
    sizes = {m.bsize for m in {id(m): m
                               for m in enc[0].state.mig.grid.reshape(-1)
                               if m is not None}.values()}
    assert BlockSize.BLOCK_4X4 in sizes
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1, 1)
    write_ivf_frame(buf, enc[0].payload, 0)
    patch_ivf_frame_count(buf, 1)
    buf.seek(0)
    yd, ud, vd, _ = next(iter(decode_ivf(buf)))
    np.testing.assert_array_equal(yd, enc[0].state.planes[0].recon[:h, :w])
