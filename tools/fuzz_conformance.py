#!/usr/bin/env python
"""Randomized conformance fuzzing: encode -> in-repo decode -> PSNR.

Sweeps random configurations (dimensions incl. non-SB multiples, presets
M0-M9, tunes, RC modes, GOP structures, error resilience, fpdm, tile
columns) over deterministic synthetic content; every stream must decode
with the from-spec decoder at a sane PSNR.  This is the fuzz layer the
reference lacks entirely (its CI only smoke-encodes one clip).

Usage: python tools/fuzz_conformance.py [n_cases] [seed]
Exit code 1 if any case fails; failures print a reproducible descriptor.
"""

import io
import random
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from tpu_vp9.api import Vp9Encoder  # noqa: E402
from tpu_vp9.bitstream.ivf import (  # noqa: E402
    write_ivf_frame, write_ivf_header,
)
from tpu_vp9.config import (  # noqa: E402
    EncoderConfig, PredStructure, RateControlMode, Tune,
)
from tpu_vp9.decoder.decoder import decode_ivf  # noqa: E402
from tpu_vp9.utils.yuv import synthetic_frames  # noqa: E402


def run_case(rng):
    w = rng.choice([64, 65, 80, 96, 112, 130, 176, 352, 512, 640])
    h = rng.choice([64, 66, 80, 96, 120, 144, 288])
    em = rng.randint(0, 9)
    tune = rng.choice([0, 1, 2])
    rc = rng.choice([0, 0, 0, 1, 2])
    ip = rng.choice([-1, -1, 3, 7])
    ps = rng.choice([0, 1, 2])
    er = rng.choice([False, False, True])
    fpdm = rng.choice([False, True])
    tc = rng.choice([1, 1, 2, 4]) if w >= 512 else 1
    qp = rng.choice([20, 35, 45, 55])
    nfr = rng.choice([3, 5, 8])
    seed = rng.randint(0, 99)
    desc = (f"{w}x{h} M{em} t{tune} rc{rc} ip{ip} ps{ps} er{int(er)} "
            f"fpdm{int(fpdm)} tc{tc} qp{qp} n{nfr} s{seed}")
    frames = list(synthetic_frames(w, h, nfr, seed=seed, motion=True))
    kw = dict(source_width=w, source_height=h, frame_rate=30, qp=qp,
              enc_mode=em, tune=Tune(tune), intra_period=ip,
              pred_structure=PredStructure(ps), error_resilient=er,
              frame_parallel_decoding=fpdm, tpu_tile_columns=tc,
              rate_control_mode=RateControlMode(rc))
    if rc != 0:
        kw["target_bit_rate"] = 300_000
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(**kw))
    enc.init()
    for fr in frames:
        enc.send_picture(fr)
    enc.flush()
    data = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        data.append(p.data)
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1, len(data))
    for i, d in enumerate(data):
        write_ivf_frame(buf, d, i)
    buf.seek(0)
    dec = list(decode_ivf(buf))
    assert len(dec) == nfr, f"decoded {len(dec)}/{nfr}"
    for s, r in zip(frames, dec):
        assert r[0].shape == (h, w), f"shape {r[0].shape}"
        mse = np.mean((np.asarray(r[0], np.float64)
                       - np.asarray(s.y, np.float64)) ** 2)
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
        assert psnr > 20, f"psnr {psnr:.1f}"
    return desc


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    rng = random.Random(seed)
    fails = []
    for i in range(n):
        try:
            desc = run_case(rng)
            print(f"[{i + 1}/{n}] OK  {desc}")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(f"{type(e).__name__}: {e}")
            print(f"[{i + 1}/{n}] FAIL {fails[-1][:120]}")
    print(f"\n{n} cases, {len(fails)} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
