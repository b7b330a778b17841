#!/usr/bin/env python
"""Benchmark: prints ONE JSON line with the current headline number.

Headline (round 3): 1080p M8 low-delay end-to-end fps through the PUBLIC
Vp9Encoder, routed over the device-resident EncDec step (ME, MC,
transform/recon, loop filter on the TPU; entropy coding on host).
vs_baseline = fraction of 60 fps (BASELINE.md config 3 real-time bar).
Secondary fields: raw device pframe_step throughput, the CIF M8
random-access host-path figure (old headline), and the M0 quality point.
All TPU fields are null when no healthy accelerator is reachable (the
tunneled device can wedge); the CIF host figures always report.
"""

import json
import time

import numpy as np


def _measure_1080p_rt():
    """Returns (e2e_fps, step_fps, bytes_per_frame) or (None,)*3."""
    import jax
    import jax.numpy as jnp

    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig, PredStructure
    from tpu_vp9.utils.yuv import synthetic_frames

    w, h = 1920, 1080
    n_warm, n_meas = 3, 20
    frames = list(synthetic_frames(w, h, 1 + n_warm + n_meas, seed=0,
                                   motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(
        source_width=w, source_height=h, frame_rate=60, qp=40, enc_mode=8,
        intra_period=-1, pred_structure=PredStructure.LOW_DELAY_P))
    enc.init()
    if enc._rt is None:
        return None, None, None
    # warmup: keyframe + first P frames cover both jit variants
    for fr in frames[: 1 + n_warm]:
        enc.send_picture(fr)
    while enc.get_packet() is not None:
        pass
    t0 = time.perf_counter()
    total = 0
    for fr in frames[1 + n_warm:]:
        enc.send_picture(fr)
    enc.flush()
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        total += len(pkt.data)
    e2e_fps = n_meas / (time.perf_counter() - t0)

    # raw device step throughput (recon/DPB chain on device, no host)
    sess = enc._rt
    g = sess.g
    rng = np.random.default_rng(0)
    from tpu_vp9.pipeline.tpu_encdec import (
        extend_borders_device, pad_plane,
    )

    src_y = jnp.asarray(pad_plane(
        rng.integers(0, 255, (h, w), dtype=np.uint8), g.pad_h, g.pad_w))
    src_u = jnp.asarray(pad_plane(
        rng.integers(0, 255, (h // 2, w // 2), dtype=np.uint8),
        g.pad_h // 2, g.pad_w // 2))
    src_v = jnp.asarray(pad_plane(
        rng.integers(0, 255, (h // 2, w // 2), dtype=np.uint8),
        g.pad_h // 2, g.pad_w // 2))
    refs = (extend_borders_device(src_y, w, h),
            extend_borders_device(src_u, w // 2, h // 2),
            extend_borders_device(src_v, w // 2, h // 2))
    pm32 = jnp.zeros_like(sess._prev_mv32)
    pm16 = jnp.zeros_like(sess._prev_mv16)
    from tpu_vp9.bitstream import tables as T
    from tpu_vp9.ops.loopfilter import pick_filter_level, sharpness_limits

    qidx = 160
    lf = pick_filter_level(qidx, False)
    lim_t, mblim_t = sharpness_limits(0)
    args = (jnp.asarray(T.dc_quant(qidx), jnp.int32),
            jnp.asarray(T.ac_quant(qidx), jnp.int32),
            jnp.asarray(100, jnp.int32), jnp.asarray(lf, jnp.int32),
            jnp.asarray(int(lim_t[lf]), jnp.int32),
            jnp.asarray(int(mblim_t[lf]), jnp.int32))
    outs, refs = sess._step(src_y, src_u, src_v, *refs, pm32, pm16, *args)
    jax.block_until_ready(refs)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        outs, refs = sess._step(src_y, src_u, src_v, *refs, pm32, pm16,
                                *args)
    jax.block_until_ready(refs)
    step_fps = iters / (time.perf_counter() - t0)
    return e2e_fps, step_fps, total // n_meas


def main() -> None:
    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.config import EncoderConfig
    from tpu_vp9.utils.device import tpu_alive
    from tpu_vp9.utils.yuv import synthetic_frames

    rt_e2e = rt_step = rt_bpf = None
    tpu_error = None
    if tpu_alive():
        try:
            rt_e2e, rt_step, rt_bpf = _measure_1080p_rt()
        except Exception:
            import traceback

            tpu_error = traceback.format_exc(limit=8)
    else:
        from tpu_vp9.utils.device import tpu_dead_reason

        tpu_error = f"tpu_alive=False: {tpu_dead_reason()}"

    # --- CIF random-access host path at M8 (BASELINE config 1) ---
    n_frames = 17  # key + one full 16-frame RA pyramid
    frames = list(synthetic_frames(352, 288, n_frames, seed=0,
                                   motion=True))
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=352, source_height=288,
                                    frame_rate=30, qp=40, enc_mode=8,
                                    intra_period=-1, tpu_realtime=0))
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
    cif_fps = (len(frames) - 1) / (time.perf_counter() - t0)

    # --- M0 quality point (full RDO incl. rect + sub-8x8 intra) ---
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=352, source_height=288,
                                    frame_rate=30, qp=40, enc_mode=0,
                                    intra_period=-1, tpu_realtime=0))
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

    headline = rt_e2e if rt_e2e is not None else cif_fps
    print(json.dumps({
        "metric": ("tpu_1080p_m8_ld_e2e_fps" if rt_e2e is not None
                   else "cif_m8_ra_e2e_fps_host_fallback"),
        "value": round(headline, 3),
        "unit": "frames/s",
        "vs_baseline": round(headline / 60.0, 4) if rt_e2e is not None
        else round(headline / 30.0, 4),
        "tpu_1080p_pframe_step_fps": (round(rt_step, 1)
                                      if rt_step else None),
        "tpu_1080p_bytes_per_frame": rt_bpf,
        "cif_m8_ra_e2e_fps": round(cif_fps, 2),
        "cif_m0_fps": round(m0_fps, 2),
        "cif_m0_bytes_per_frame": m0_bytes // max(len(frames), 1),
        "cif_bytes_per_frame": total_bytes // max(len(frames) - 1, 1),
        "tpu_error": tpu_error,
    }))


if __name__ == "__main__":
    main()
