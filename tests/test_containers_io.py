"""IVF container and YUV/Y4M IO tests."""

import io

import numpy as np

from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count,
    read_ivf,
    write_ivf_frame,
    write_ivf_header,
)
from tpu_vp9.utils.yuv import (
    read_y4m,
    read_yuv_frames,
    synthetic_frames,
    write_y4m,
)


def test_ivf_roundtrip():
    buf = io.BytesIO()
    write_ivf_header(buf, 352, 288, 30000, 1001, 0)
    payloads = [b"\x12\x34" * 10, b"frame2", b"x" * 1000]
    for i, p in enumerate(payloads):
        write_ivf_frame(buf, p, pts=i)
    patch_ivf_frame_count(buf, len(payloads))
    buf.seek(0)
    frames = list(read_ivf(buf))
    assert [f.payload for f in frames] == payloads
    assert [f.pts for f in frames] == [0, 1, 2]


def test_yuv_roundtrip():
    frames = list(synthetic_frames(64, 64, 3))
    raw = b"".join(f.y.tobytes() + f.u.tobytes() + f.v.tobytes() for f in frames)
    out = list(read_yuv_frames(io.BytesIO(raw), 64, 64))
    assert len(out) == 3
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.u, b.u)
        np.testing.assert_array_equal(a.v, b.v)


def test_y4m_roundtrip():
    frames = list(synthetic_frames(96, 64, 2))
    buf = io.BytesIO()
    write_y4m(buf, frames, fps_num=30000, fps_den=1001)
    buf.seek(0)
    header, it = read_y4m(buf)
    out = list(it)
    assert header.width == 96 and header.height == 64
    assert header.fps_num == 30000 and header.fps_den == 1001
    assert len(out) == 2
    np.testing.assert_array_equal(out[1].y, frames[1].y)


def test_synthetic_determinism():
    a = list(synthetic_frames(64, 64, 4, seed=3))
    b = list(synthetic_frames(64, 64, 4, seed=3))
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa.y, fb.y)
