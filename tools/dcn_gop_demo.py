#!/usr/bin/env python
"""2-process DCN GOP-parallel dry run + scaling measurement hook.

Launches N worker processes on this machine, each running
``encode_gop_distributed`` against a local jax.distributed coordinator
(the DCN control plane), verifies the merged stream is byte-identical
to a sequential single-process encode, and reports the fps scaling
ratio — the measurement the BASELINE ≥80%-to-4-hosts bar is judged by
(here processes stand in for hosts; over real DCN the same code path
runs unchanged).

Usage: python tools/dcn_gop_demo.py [--procs 2] [--frames 48] [--qp 40]
The child role is internal (--worker).
"""

from __future__ import annotations

import argparse
import os
import pickle
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "127.0.0.1:8497"


def _make_inputs(frames: int):
    from tpu_vp9.config import EncoderConfig
    from tpu_vp9.utils.yuv import synthetic_frames

    frs = list(synthetic_frames(352, 288, frames, seed=0, motion=True))
    cfg = EncoderConfig(source_width=352, source_height=288, frame_rate=30,
                        qp=40, enc_mode=8, intra_period=15, tpu_realtime=0)
    return frs, cfg


def worker(procs: int, pid: int, frames: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpu_vp9.pipeline.distributed import encode_gop_distributed

    frs, cfg = _make_inputs(frames)
    t0 = time.perf_counter()
    pkts = encode_gop_distributed(frs, cfg, coordinator=COORD,
                                  num_processes=procs, process_id=pid)
    dt = time.perf_counter() - t0
    if pid == 0:
        with open(out_path, "wb") as f:
            pickle.dump({"pkts": pkts, "seconds": dt}, f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--worker", type=int, default=-1)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.worker >= 0:
        worker(args.procs, args.worker, args.frames, args.out)
        return

    import jax

    jax.config.update("jax_platforms", "cpu")
    frs, cfg = _make_inputs(args.frames)
    from tpu_vp9.pipeline.gop_parallel import encode_gop_parallel

    t0 = time.perf_counter()
    seq = encode_gop_parallel(frs, cfg, workers=1)
    seq_dt = time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "p0.pkl")
        procs = []
        for pid in range(args.procs):
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--procs", str(args.procs), "--frames", str(args.frames),
                 "--worker", str(pid), "--out", out],
                env=env, cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))))
        rcs = [p.wait(timeout=900) for p in procs]
        assert all(rc == 0 for rc in rcs), f"worker exit codes {rcs}"
        with open(out, "rb") as f:
            res = pickle.load(f)
    assert [p[0] for p in res["pkts"]] == [p[0] for p in seq], \
        "DCN-distributed stream is not byte-identical to sequential"
    par_dt = res["seconds"]
    scale = seq_dt / par_dt / args.procs
    print(f"dcn_gop_demo OK: {args.frames} frames, {args.procs} procs, "
          f"byte-identical; sequential {args.frames / seq_dt:.2f} fps, "
          f"distributed {args.frames / par_dt:.2f} fps, "
          f"scaling efficiency {100 * scale:.0f}%")


if __name__ == "__main__":
    main()
