"""Independent conformance oracle: decode our streams with the SYSTEM
libvpx decoder (libvpx.so.7, Debian-shipped, built from upstream) via
ctypes.

This closes the self-authored-oracle gap: encoder bugs that our own
Python decoder mirrors (shared spec misreadings) are caught here, because
libvpx shares no code with this repo.  ABI: vpx 1.12 (so.7); the decoder
ABI version is probed at init to survive minor packaging differences.

Usage:
    from tools.libvpx_oracle import decode_ivf
    frames = decode_ivf(ivf_bytes)   # list of (y, u, v) uint8 arrays
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None
_ABI = None


class VpxImage(ctypes.Structure):
    # vpx_image.h, VPX_IMAGE_ABI_VERSION 5 (vpx >= 1.7)
    _fields_ = [
        ("fmt", ctypes.c_int),
        ("cs", ctypes.c_int),
        ("range", ctypes.c_int),
        ("w", ctypes.c_uint),
        ("h", ctypes.c_uint),
        ("bit_depth", ctypes.c_uint),
        ("d_w", ctypes.c_uint),
        ("d_h", ctypes.c_uint),
        ("r_w", ctypes.c_uint),
        ("r_h", ctypes.c_uint),
        ("x_chroma_shift", ctypes.c_uint),
        ("y_chroma_shift", ctypes.c_uint),
        ("planes", ctypes.POINTER(ctypes.c_ubyte) * 4),
        ("stride", ctypes.c_int * 4),
        ("bps", ctypes.c_int),
        ("user_priv", ctypes.c_void_p),
        ("img_data", ctypes.c_void_p),
        ("img_data_owner", ctypes.c_int),
        ("self_allocd", ctypes.c_int),
        ("fb_priv", ctypes.c_void_p),
    ]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for name in ("libvpx.so.7", "libvpx.so", "libvpx.so.6"):
        try:
            _LIB = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if _LIB is None:
        return None
    lib = _LIB
    lib.vpx_codec_vp9_dx.restype = ctypes.c_void_p
    lib.vpx_codec_dec_init_ver.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_long, ctypes.c_int]
    lib.vpx_codec_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_uint,
        ctypes.c_void_p, ctypes.c_long]
    lib.vpx_codec_get_frame.restype = ctypes.POINTER(VpxImage)
    lib.vpx_codec_get_frame.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_void_p)]
    lib.vpx_codec_destroy.argtypes = [ctypes.c_void_p]
    lib.vpx_codec_error.argtypes = [ctypes.c_void_p]
    lib.vpx_codec_error.restype = ctypes.c_char_p
    lib.vpx_codec_error_detail.argtypes = [ctypes.c_void_p]
    lib.vpx_codec_error_detail.restype = ctypes.c_char_p
    return lib


def available() -> bool:
    return _load() is not None


class LibvpxDecoder:
    """Streaming VP9 decoder over the system libvpx."""

    def __init__(self) -> None:
        global _ABI
        lib = _load()
        if lib is None:
            raise RuntimeError("libvpx not available")
        self._lib = lib
        self._ctx = ctypes.create_string_buffer(512)  # opaque vpx_codec_ctx_t
        iface = lib.vpx_codec_vp9_dx()
        versions = [_ABI] if _ABI is not None else list(range(10, 16))
        err = -1
        for ver in versions:
            err = lib.vpx_codec_dec_init_ver(self._ctx, iface, None, 0, ver)
            if err == 0:
                _ABI = ver
                break
        if err != 0:
            raise RuntimeError(f"vpx_codec_dec_init failed: {err}")

    def decode(self, payload: bytes):
        """Decode one frame payload (may be a superframe); returns list of
        (y, u, v) uint8 arrays for every shown frame."""
        lib = self._lib
        buf = (ctypes.c_ubyte * len(payload)).from_buffer_copy(payload)
        err = lib.vpx_codec_decode(self._ctx, buf, len(payload), None, 0)
        if err != 0:
            detail = lib.vpx_codec_error_detail(self._ctx)
            raise RuntimeError(
                f"libvpx decode error {err}: "
                f"{lib.vpx_codec_error(self._ctx)} {detail}")
        out = []
        it = ctypes.c_void_p(None)
        while True:
            img = lib.vpx_codec_get_frame(self._ctx, ctypes.byref(it))
            if not img:
                break
            im = img.contents
            planes = []
            for p in range(3):
                shift = 0 if p == 0 else im.y_chroma_shift
                xshift = 0 if p == 0 else im.x_chroma_shift
                h = (im.d_h + shift) >> shift
                w = (im.d_w + xshift) >> xshift
                stride = im.stride[p]
                n = stride * (h - 1) + w
                flat = np.ctypeslib.as_array(im.planes[p], shape=(n,))
                rows = np.lib.stride_tricks.as_strided(
                    flat, shape=(h, w), strides=(stride, 1))
                planes.append(rows.copy())
            out.append(tuple(planes))
        return out

    def close(self) -> None:
        if self._ctx is not None:
            self._lib.vpx_codec_destroy(self._ctx)
            self._ctx = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def iter_ivf(data: bytes):
    """Yield frame payloads from an IVF container."""
    assert data[:4] == b"DKIF", "not an IVF file"
    off = int.from_bytes(data[6:8], "little")
    pos = off
    while pos + 12 <= len(data):
        sz = int.from_bytes(data[pos : pos + 4], "little")
        pos += 12
        yield data[pos : pos + sz]
        pos += sz


def decode_ivf(data: bytes):
    """Decode a whole IVF byte string; returns list of (y, u, v)."""
    dec = LibvpxDecoder()
    frames = []
    try:
        for payload in iter_ivf(data):
            frames.extend(dec.decode(payload))
    finally:
        dec.close()
    return frames


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0 * 255.0 / mse)
