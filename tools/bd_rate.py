#!/usr/bin/env python
"""Quality-parity harness: BD-rate of tpu_vp9 vs the upstream SVT-VP9
reference encoder (BASELINE.md north star: matched PSNR at M8).

Both encoders run CQP random-access (intra only on frame 0) over a QP
sweep on each clip; both bitstreams are decoded by the INDEPENDENT
system libvpx oracle (tools/libvpx_oracle.py), so the distortion
numbers share one decoder and cannot be flattered by self-decoding.
BD-rate uses the standard Bjontegaard cubic fit of PSNR vs log-rate,
integrated over the overlapping PSNR range.

Reference binary: tools/svt_ref/build_ref.sh (C-kernel build of
/root/reference; output bit-identical to upstream's C-only path).

Usage:
    python tools/bd_rate.py [--enc-mode 8] [--frames 60] [--qps 30,40,50,60]
Prints a per-clip table and the average BD-rate (negative = tpu_vp9
needs fewer bits than SVT-VP9 at equal PSNR).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.libvpx_oracle import decode_ivf  # noqa: E402

REF_APP = os.environ.get(
    "SVT_VP9_APP", "/tmp/svt_ref_build/src/Bin/Release/SvtVp9EncApp")


def clips(frames: int, w: int = 352, h: int = 288,
          mixed: bool = False):
    """Synthetic but differentiated content: global pan, noisy detail,
    scene-cut free zoom-ish motion.  (No egress: no real clips in the
    image; the harness accepts -i overrides for real y4m when present.)
    mixed: add a scene-cut clip (two sources spliced mid-stream) — the
    long-clip configuration of the parity evidence."""
    from tpu_vp9.utils.yuv import synthetic_frames

    out = []
    for name, seed, motion in (("pan_text", 0, True), ("noisy", 7, True),
                               ("slow", 3, False)):
        frs = list(synthetic_frames(w, h, frames, seed=seed,
                                    motion=motion))
        out.append((name, w, h, frs))
    if mixed:
        a = list(synthetic_frames(w, h, frames // 2, seed=11, motion=True))
        b = list(synthetic_frames(w, h, frames - frames // 2, seed=23,
                                  motion=False))
        out.append((f"cut{frames // 2}", w, h, a + b))
    return out


def write_yuv(path, frs):
    with open(path, "wb") as f:
        for fr in frs:
            f.write(fr.y.tobytes())
            f.write(fr.u.tobytes())
            f.write(fr.v.tobytes())


def psnr_stream(ivf_bytes: bytes, frs) -> float:
    """Global weighted YUV PSNR (6/1/1 over planes) via libvpx decode."""
    dec = decode_ivf(ivf_bytes)
    assert len(dec) == len(frs), (len(dec), len(frs))
    se = n = 0.0
    for (dy, du, dv), fr in zip(dec, frs):
        for d, s, w in ((dy, fr.y, 4.0), (du, fr.u, 1.0), (dv, fr.v, 1.0)):
            se += w * float(np.sum(
                (d.astype(np.float64) - s.astype(np.float64)) ** 2))
            n += w * d.size
    return 10.0 * np.log10(255.0 ** 2 / (se / n))


def encode_ref(yuv, w, h, n, qp, enc_mode, out_ivf, pred_struct=2,
               rc=0, tbr=0):
    cmd = [REF_APP, "-i", yuv, "-w", str(w), "-h", str(h), "-fps", "30",
           "-q", str(qp), "-enc-mode", str(enc_mode), "-n", str(n),
           "-intra-period", "-1", "-pred-struct", str(pred_struct),
           "-rc", str(rc), "-b", out_ivf]
    if rc:
        cmd += ["-tbr", str(tbr)]
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    with open(out_ivf, "rb") as f:
        return f.read()


def encode_ours(frs, w, h, qp, enc_mode, rt: bool = False,
                vbr_tbr: int = 0, rt_ra: bool = False):
    import io

    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.bitstream.ivf import (
        patch_ivf_frame_count, write_ivf_frame, write_ivf_header,
    )
    from tpu_vp9.config import EncoderConfig, PredStructure, RateControlMode

    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(
        source_width=w, source_height=h, frame_rate=30, qp=qp,
        enc_mode=enc_mode, intra_period=-1,
        rate_control_mode=(RateControlMode.VBR if vbr_tbr
                           else RateControlMode.CQP),
        target_bit_rate=vbr_tbr or 7_000_000,
        # --rt: quality measured THROUGH the device EncDec path (forced
        # onto whatever jax backend is live; VERDICT r3 next-step #2)
        tpu_realtime=2 if (rt or rt_ra) else 0,
        pred_structure=(PredStructure.LOW_DELAY_P if rt
                        else PredStructure.RANDOM_ACCESS)))
    enc.init()
    if rt and enc._rt is None:
        raise RuntimeError("--rt requested but realtime session not built")
    if rt_ra and enc._ra_dev is None:
        raise RuntimeError("--rt-ra requested but the device RA session "
                           "was not built")
    pkts = []
    for fr in frs:
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
    buf = io.BytesIO()
    write_ivf_header(buf, w, h, 30, 1)
    for p in pkts:
        write_ivf_frame(buf, p.data, p.pts)
    patch_ivf_frame_count(buf, len(pkts))
    return buf.getvalue()


def bd_rate(r_ref, p_ref, r_test, p_test) -> float:
    """Bjontegaard delta-rate (%): cubic fit of log-rate over PSNR."""
    lr_ref, lr_test = np.log(r_ref), np.log(r_test)
    fit_ref = np.polyfit(p_ref, lr_ref, 3)
    fit_test = np.polyfit(p_test, lr_test, 3)
    lo = max(min(p_ref), min(p_test))
    hi = min(max(p_ref), max(p_test))
    if hi <= lo:
        return float("nan")
    int_ref = np.polyint(fit_ref)
    int_test = np.polyint(fit_test)
    avg_ref = (np.polyval(int_ref, hi) - np.polyval(int_ref, lo)) / (hi - lo)
    avg_test = (np.polyval(int_test, hi) - np.polyval(int_test, lo)) / (hi - lo)
    return float((np.exp(avg_test - avg_ref) - 1.0) * 100.0)


def main():
    # the axon sitecustomize ignores JAX_PLATFORMS; honor it here so the
    # --rt sweep can run hermetically on CPU jax (the device path's
    # decisions are backend-exact, so CPU-measured BD-rate is valid)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--enc-mode", type=int, default=8)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--qps", default="30,40,50,60")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--rt", action="store_true",
                    help="measure the device realtime path (low-delay vs "
                         "reference -pred-struct 0)")
    ap.add_argument("--rt-ra", dest="rt_ra", action="store_true",
                    help="measure the DEVICE hierarchical-RA path "
                         "(DeviceRaSession) against the reference's "
                         "shipping RA mode")
    ap.add_argument("--width", type=int, default=352)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--mixed", action="store_true",
                    help="add a spliced scene-cut clip")
    ap.add_argument("--vbr-tbrs", default="",
                    help="comma-separated target bitrates: VBR "
                         "rate-accuracy sweep instead of the CQP QP sweep")
    args = ap.parse_args()
    qps = [int(q) for q in args.qps.split(",")]
    tbrs = [int(t) for t in args.vbr_tbrs.split(",") if t]

    if not os.path.exists(REF_APP):
        print(f"reference app missing; run tools/svt_ref/build_ref.sh "
              f"(looked at {REF_APP})", file=sys.stderr)
        sys.exit(2)

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for name, w, h, frs in clips(args.frames, args.width, args.height,
                                     args.mixed):
            yuv = os.path.join(td, f"{name}.yuv")
            write_yuv(yuv, frs)
            r_ref, p_ref, r_our, p_our = [], [], [], []
            points = ([("vbr", t) for t in tbrs] if tbrs
                      else [("qp", q) for q in qps])
            for kind, val in points:
                # the reference REQUIRES pred-struct 2 (verify_settings:
                # "Pred Structure must be [2]"), so the --rt comparison
                # pits our low-delay device path against the reference's
                # only shipping mode — a structural handicap for the RT
                # side (no pyramids), reported as-is
                ivf = encode_ref(
                    yuv, w, h, len(frs), 50 if kind == "vbr" else val,
                    args.enc_mode, os.path.join(td, f"{name}_{val}.ivf"),
                    pred_struct=2,
                    rc=1 if kind == "vbr" else 0,
                    tbr=val if kind == "vbr" else 0)
                r_ref.append(len(ivf))
                p_ref.append(psnr_stream(ivf, frs))
                ours = encode_ours(frs, w, h,
                                   50 if kind == "vbr" else val,
                                   args.enc_mode, rt=args.rt,
                                   vbr_tbr=val if kind == "vbr" else 0,
                                   rt_ra=args.rt_ra)
                r_our.append(len(ours))
                p_our.append(psnr_stream(ours, frs))
            bd = bd_rate(r_ref, p_ref, r_our, p_our)
            rows.append({
                "clip": name, "bd_rate_pct": round(bd, 2),
                "ref": [[r, round(p, 3)] for r, p in zip(r_ref, p_ref)],
                "ours": [[r, round(p, 3)] for r, p in zip(r_our, p_our)],
            })
            print(f"{name}: BD-rate {bd:+.2f}%  "
                  f"ref={[(r, round(p, 2)) for r, p in zip(r_ref, p_ref)]}  "
                  f"ours={[(r, round(p, 2)) for r, p in zip(r_our, p_our)]}")
    avg = float(np.mean([r["bd_rate_pct"] for r in rows]))
    print(f"AVERAGE BD-rate vs SVT-VP9 M{args.enc_mode}: {avg:+.2f}% "
          f"(negative = we beat the reference)")
    if args.json:
        print(json.dumps({"enc_mode": args.enc_mode, "avg_bd_rate": avg,
                          "clips": rows}))


if __name__ == "__main__":
    main()
