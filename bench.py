#!/usr/bin/env python
"""Benchmark: prints ONE JSON line with the current headline number.

Current headline (round 1): end-to-end conformant intra CIF encode fps
(host serialization still Python; the TPU analysis step is reported as a
secondary field).  vs_baseline = fraction of 30 fps real time.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax

    from tpu_vp9.bitstream.headers import FrameHeader, assemble_frame
    from tpu_vp9.bitstream.tables import TxMode
    from tpu_vp9.codec.intra_frame import encode_keyframe
    from tpu_vp9.pipeline.tpu_intra import intra_encode_step
    from tpu_vp9.utils.yuv import synthetic_frames

    # --- TPU analysis step throughput at 1080p (guarded: the tunneled
    # device can wedge; never hang the bench) ---
    from tpu_vp9.utils.device import tpu_alive

    analysis_fps_1080 = None
    me_blocks_per_s = None
    if tpu_alive():
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        plane_1080 = jnp.asarray(rng.integers(0, 255, (1088, 1920)),
                                 jnp.uint8)
        q = jnp.asarray(100, jnp.int32)
        step = jax.jit(lambda p, qq: intra_encode_step(p, qq, 32))
        jax.block_until_ready(step(plane_1080, q))  # compile
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = step(plane_1080, q)
        jax.block_until_ready(out)
        analysis_fps_1080 = round(
            iters / (time.perf_counter() - t0), 1)
        # device full-pel ME: all 32x32 blocks of a 1080p frame vs a
        # border-extended reference, r=16 (the hot SAD kernel)
        try:
            from tpu_vp9.ops.inter import extend_borders
            from tpu_vp9.pipeline.tpu_me import tpu_block_motion

            src = np.asarray(rng.integers(0, 255, (1088, 1920)), np.uint8)
            ref = extend_borders(
                np.asarray(rng.integers(0, 255, (1088, 1920)), np.uint8),
                1920, 1088)
            tpu_block_motion(src, ref, 96, 32, 16)  # compile
            t0 = time.perf_counter()
            for _ in range(5):
                mvs = tpu_block_motion(src, ref, 96, 32, 16)
            dt = time.perf_counter() - t0
            nblk = (1088 // 32) * (1920 // 32)
            me_blocks_per_s = round(5 * nblk / dt)
        except Exception:
            me_blocks_per_s = None

    # --- end-to-end conformant CIF random-access encode at preset M8
    # (config 1 of BASELINE.md) ---
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig

    n_frames = 17  # key + one full 16-frame RA pyramid
    frames = list(synthetic_frames(352, 288, n_frames, seed=0,
                                   motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=352, source_height=288,
                                    frame_rate=30, qp=40, enc_mode=8,
                                    intra_period=-1))
    enc.init()
    enc.send_picture(frames[0])  # warm caches/JIT outside the timer
    while enc.get_packet() is not None:
        pass
    t0 = time.perf_counter()
    total_bytes = 0
    for fr in frames[1:]:
        enc.send_picture(fr)
    enc.flush()
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        total_bytes += len(pkt.data)
    e2e_fps = (len(frames) - 1) / (time.perf_counter() - t0)

    # quality-preset point: same clip at M0 (full RDO incl. rect +
    # sub-8x8 intra)
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=352, source_height=288,
                                    frame_rate=30, qp=40, enc_mode=0,
                                    intra_period=-1))
    enc.init()
    t0 = time.perf_counter()
    m0_bytes = 0
    for fr in frames:
        enc.send_picture(fr)
    enc.flush()
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        m0_bytes += len(pkt.data)
    m0_fps = len(frames) / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "cif_m8_ra_e2e_fps",
        "value": round(e2e_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(e2e_fps / 30.0, 4),
        "cif_m0_fps": round(m0_fps, 2),
        "cif_m0_bytes_per_frame": m0_bytes // max(len(frames), 1),
        "tpu_1080p_intra_analysis_fps": analysis_fps_1080,
        "tpu_1080p_me32_blocks_per_s": me_blocks_per_s,
        "bitstream_bytes_per_frame": total_bytes // max(len(frames) - 1, 1),
    }))


if __name__ == "__main__":
    main()
