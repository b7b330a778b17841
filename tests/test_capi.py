"""C API (libtpu_vp9.so) end-to-end: build the embedded-interpreter
shared library + smoke driver, encode through the C surface, decode
the result with system libvpx (the same surface the FFmpeg/GStreamer
plugins consume)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(REPO, "plugins", "capi")


def test_capi_smoke_encodes_and_libvpx_decodes(tmp_path):
    from tools.libvpx_oracle import available, decode_ivf

    if not available():
        pytest.skip("system libvpx unavailable")
    r = subprocess.run(["make", "-C", CAPI], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "capi.ivf")
    env = dict(os.environ, PYTHONPATH=REPO, TPU_VP9_FORCE_HOST="1",
               JAX_PLATFORMS="cpu")
    r = subprocess.run([os.path.join(CAPI, "capi_smoke"), out],
                       capture_output=True, text=True, timeout=600,
                       env=env)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "8 packets" in r.stdout
    with open(out, "rb") as f:
        dec = decode_ivf(f.read())
    assert len(dec) == 8
    assert dec[0][0].shape == (80, 96)
