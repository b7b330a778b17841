"""Native RT serializer: byte-identical to the Python serializer
(classify_and_fill_state + serialize_with_updates) across the RT
feature set (plain grid / split16 / golden / strip / ER / temporal MVs).
"""

import io
import os

import numpy as np
import pytest

from tpu_vp9 import native as nat
from tpu_vp9.bitstream.ivf import (
    patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
)
from tpu_vp9.decoder.decoder import decode_ivf
from tpu_vp9.pipeline.realtime import encode_stream_rt
from tpu_vp9.utils.yuv import synthetic_frames

pytestmark = pytest.mark.skipif(
    nat.get_lib() is None or not hasattr(nat.get_lib(), "rt_serialize"),
    reason="native library unavailable")


def _payloads(frames, **kw):
    enc = encode_stream_rt(frames, **kw)
    return [e.payload for e in enc], enc


@pytest.mark.parametrize("kw", [
    dict(qindex=120),
    dict(qindex=120, split16=True),
    dict(qindex=110, split16=True, golden=True, golden_interval=3),
    dict(qindex=140, error_resilient=True),
])
def test_rt_native_serializer_byte_identical(kw):
    w, h = 128, 96
    frames = list(synthetic_frames(w, h, 6, seed=2, motion=True))
    os.environ["TPU_VP9_NO_NATIVE_SER"] = "1"
    try:
        py, _ = _payloads(frames, **kw)
    finally:
        os.environ.pop("TPU_VP9_NO_NATIVE_SER", None)
    nat_pl, enc = _payloads(frames, **kw)
    assert len(py) == len(nat_pl)
    for i, (a, b) in enumerate(zip(py, nat_pl)):
        assert a == b, f"frame {i}: python {len(a)}B != native {len(b)}B"
    # and it still decodes bit-exact against the device recon
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for i, ef in enumerate(enc):
        write_ivf_frame(buf, ef.payload, i)
    patch_ivf_frame_count(buf, len(enc))
    buf.seek(0)
    dec = list(decode_ivf(buf))
    for i, (ef, (y, u, v, _)) in enumerate(zip(enc, dec)):
        st = ef.state
        np.testing.assert_array_equal(y, st.planes[0].recon[:h, :w],
                                      err_msg=f"frame {i}")


def test_rt_native_serializer_strip_geometry():
    w, h = 128, 80  # mi_rows 10 -> 16-strip
    frames = list(synthetic_frames(w, h, 4, seed=6, motion=True))
    os.environ["TPU_VP9_NO_NATIVE_SER"] = "1"
    try:
        py, _ = _payloads(frames, qindex=120)
    finally:
        os.environ.pop("TPU_VP9_NO_NATIVE_SER", None)
    nat_pl, _ = _payloads(frames, qindex=120)
    assert py == nat_pl


# ---------------------------------------------------------------------------
# Scan-prefix compressed device->host transfer (SVT-VP9 ships whole
# coefficient planes between kernel stages; here the axon tunnel's
# ~23 MB/s makes the level planes the 1080p wall, so the device ships
# int8 scan prefixes + a per-block overflow mask instead)
# ---------------------------------------------------------------------------


def _run_scan_ab(frames, qindex, **kw):
    """Encode with and without the scan-prefix transfer; return the two
    payload lists plus the scan_ks values the transfer layer chose."""
    import tpu_vp9.pipeline.realtime as rt

    seen = []
    orig = rt._device_out_to_host

    def spy(*a):
        h = orig(*a)
        seen.append(h["scan_ks"])
        return h

    rt._device_out_to_host = spy
    try:
        pre, _ = _payloads(frames, qindex=qindex, **kw)
    finally:
        rt._device_out_to_host = orig
    os.environ["TPU_VP9_NO_SCAN_PREFIX"] = "1"
    try:
        flat, _ = _payloads(frames, qindex=qindex, **kw)
    finally:
        os.environ.pop("TPU_VP9_NO_SCAN_PREFIX", None)
    return pre, flat, seen


def test_scan_prefix_noisy_byte_identical():
    # noisy content overflows the prefixes: per-block full-plane
    # patch-up path (host-side reconstruction, 2-D native serializer)
    frames = list(synthetic_frames(128, 96, 5, seed=3, motion=True))
    pre, flat, seen = _run_scan_ab(frames, 90, split16=True)
    assert pre == flat
    assert seen  # transfer layer exercised


def test_scan_prefix_clean_native_path():
    # smooth content fits the prefixes: the native serializer consumes
    # them directly (scan_ks nonzero at least once)
    from tpu_vp9.utils.yuv import Frame420

    yy, xx = np.mgrid[0:96, 0:128]
    frames = []
    for i in range(5):
        y = ((xx + yy + 3 * i) % 255).astype(np.uint8)
        u = np.full((48, 64), 120, np.uint8)
        v = np.full((48, 64), 130, np.uint8)
        frames.append(Frame420(y=y, u=u, v=v))
    pre, flat, seen = _run_scan_ab(frames, 120, split16=True, golden=True)
    assert pre == flat
    assert any(any(k) for k in seen), f"scan path never engaged: {seen}"


def test_scan_prefix_python_fallback_byte_identical():
    # prefixes on + native serializer off: the Python serializer runs
    # from host-reconstructed 2-D levels
    frames = list(synthetic_frames(128, 96, 4, seed=4, motion=True))
    os.environ["TPU_VP9_NO_NATIVE_SER"] = "1"
    try:
        pre, flat, _ = _run_scan_ab(frames, 110, split16=True)
    finally:
        os.environ.pop("TPU_VP9_NO_NATIVE_SER", None)
    assert pre == flat
