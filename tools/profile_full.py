"""Time the full device P-frame steps with a forced d2h sync.

On the axon tunnel block_until_ready can return before remote
completion; fetching a scalar output forces the queue to drain, so all
timings here loop N steps then fetch once.
Usage: python tools/profile_full.py [w h]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_vp9.bitstream import tables as T
from tpu_vp9.pipeline import tpu_encdec as E
from tpu_vp9.utils.yuv import synthetic_frames


def main():
    w, h = 1920, 1080
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) >= 2:
        w, h = int(args[0]), int(args[1])
    g = E.make_geom(w, h)
    frames = list(synthetic_frames(w, h, 2))
    qidx = 160
    dc_q = jnp.asarray(T.dc_quant(qidx), jnp.int32)
    ac_q = jnp.asarray(T.ac_quant(qidx), jnp.int32)
    lam = jnp.asarray(max(1, (T.ac_quant(qidx) ** 2) >> 6), jnp.int32)

    def up(f):
        return tuple(
            jnp.asarray(E.pad_plane(np.asarray(p), g.pad_h >> s,
                                    g.pad_w >> s))
            for p, s in ((f.y, 0), (f.u, 1), (f.v, 1)))

    src_y, src_u, src_v = up(frames[1])
    ry, ru, rv = up(frames[0])
    ref_y = jax.jit(lambda p: E.extend_borders_device(
        p, g.width, g.height))(ry)
    ref_u = jax.jit(lambda p: E.extend_borders_device(
        p, g.width >> 1, (g.height + 1) >> 1))(ru)
    ref_v = jax.jit(lambda p: E.extend_borders_device(
        p, g.width >> 1, (g.height + 1) >> 1))(rv)
    _ = np.asarray(ref_y[0, 0])

    from tpu_vp9.ops.loopfilter import sharpness_limits
    lim_t, mblim_t = sharpness_limits(0)
    lf = (jnp.asarray(32, jnp.int32),
          jnp.asarray(int(lim_t[32]), jnp.int32),
          jnp.asarray(int(mblim_t[32]), jnp.int32))
    variants = [(False, False)]
    if not g.strip:
        variants.append((True, True))
    for split16, golden in variants:
        step = E.make_pframe_step(g, split16=split16, golden=golden,
                                  blob_recon=True)
        rows, cols = g.rows32, g.cols32
        n16 = (rows * 2 * cols * 2) if split16 else (
            g.cols16 if g.strip else 1)
        prev32 = jnp.zeros((rows * cols, 2), jnp.int32)
        prev16 = jnp.zeros((n16, 2), jnp.int32)
        extra = ()
        gold = None
        if golden:
            t = E.make_rate_tabs(T.default_frame_context(), qidx)
            extra = tuple(jnp.asarray(t[k]) for k in
                          ("mode_cost", "joint_cost", "nmv_row",
                           "nmv_col", "ref_cost", "lam_bits"))
            gold = (jnp.copy(ref_y), jnp.copy(ref_u), jnp.copy(ref_v))

        def run(refs):
            if golden:
                return step(src_y, src_u, src_v, *refs, *gold, prev32,
                            prev16, dc_q, ac_q, lam, *lf, *extra)
            return step(src_y, src_u, src_v, *refs, prev32, prev16,
                        dc_q, ac_q, lam, *lf)

        refs = (jnp.copy(ref_y), jnp.copy(ref_u), jnp.copy(ref_v))
        outs, refs = run(refs)
        _ = np.asarray(outs["m32"]["rate"])  # sync
        iters = 10
        t0 = time.perf_counter()
        for _i in range(iters):
            outs, refs = run(refs)
        _ = np.asarray(outs["m32"]["rate"])  # drain the queue
        ms = (time.perf_counter() - t0) / iters * 1000
        name = "M8(split16+golden)" if split16 else "M9(uniform32)"
        print(f"{name}: {ms:.1f} ms = {1000 / ms:.1f} fps", flush=True)
        # with blob fetch per frame (the e2e transfer cost)
        t0 = time.perf_counter()
        for _i in range(iters):
            outs, refs = run(refs)
            blob = np.asarray(outs["hostblob"])
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name} +blob({blob.size}B): {ms:.1f} ms "
              f"= {1000 / ms:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
