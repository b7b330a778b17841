"""Micro-benchmarks: tunnel bandwidth, MC formulations, int vs f32."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_vp9.bitstream import tables as T
from tpu_vp9.pipeline import tpu_encdec as E


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000.0, r


def main():
    # --- tunnel bandwidth ---
    for mb in (1, 4):
        x = np.random.randint(0, 255, (mb * 1024 * 1024,), np.uint8)
        t0 = time.perf_counter()
        for _ in range(3):
            d = jnp.asarray(x)
            jax.block_until_ready(d)
        h2d = 3 * mb / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = np.asarray(d)
        d2h = 3 * mb / (time.perf_counter() - t0)
        print(f"{mb}MB: h2d {h2d:.1f} MB/s  d2h {d2h:.1f} MB/s", flush=True)

    # --- MC formulations at 1080p-32 scale: B=2040, n=32 ---
    B, n = 2040, 32
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 255, (1280, 2112), np.uint8))
    pos_y = jnp.asarray(rng.integers(0, 1000, (B,), np.int32))
    pos_x = jnp.asarray(rng.integers(0, 1800, (B,), np.int32))
    mv_r = jnp.asarray(rng.integers(-300, 300, (B,), np.int32))
    mv_c = jnp.asarray(rng.integers(-300, 300, (B,), np.int32))
    filters = T.subpel_filters(T.InterpFilter.EIGHTTAP)

    f_cur = jax.jit(lambda r, py, px, mr, mc: E.mc_predict_batch(
        r, py, px, mr, mc, n, 0, 135, 240, filters))
    ms, _ = timeit(f_cur, ref, pos_y, pos_x, mv_r, mv_c)
    print(f"mc_predict_batch (int einsum): {ms:.2f} ms", flush=True)

    # f32 accumulate form
    fj = jnp.asarray(np.asarray(filters, np.float32))

    def mc_f32(ref_padded, py, px, mr, mc):
        mi_r = py // 8
        mi_c = px // 8
        row_q4, col_q4 = E._clamp_mv_umv(mr, mc, mi_r, mi_c, n, n, 0,
                                         135, 240)
        x_q4 = (px << 4) + col_q4
        y_q4 = (py << 4) + row_q4
        x0 = x_q4 >> 4
        y0 = y_q4 >> 4
        spx = x_q4 & 15
        spy = y_q4 & 15
        win = n + 7

        def slice_one(y, x):
            return jax.lax.dynamic_slice(ref_padded, (y, x), (win, win))

        wins = jax.vmap(slice_one)(E.BORDER + y0 - 3,
                                   E.BORDER + x0 - 3).astype(jnp.float32)
        fx = fj[spx]  # (B, 8)
        fy = fj[spy]
        acc = wins[:, :, 0:n] * fx[:, 0, None, None]
        for k in range(1, 8):
            acc = acc + wins[:, :, k:k + n] * fx[:, k, None, None]
        inter = jnp.clip(jnp.floor((acc + 64) / 128), 0, 255)
        acc = inter[:, 0:n, :] * fy[:, 0, None, None]
        for k in range(1, 8):
            acc = acc + inter[:, k:k + n, :] * fy[:, k, None, None]
        out = jnp.clip(jnp.floor((acc + 64) / 128), 0, 255)
        return out.astype(jnp.uint8)

    f_new = jax.jit(mc_f32)
    ms, o2 = timeit(f_new, ref, pos_y, pos_x, mv_r, mv_c)
    o1 = f_cur(ref, pos_y, pos_x, mv_r, mv_c)
    print(f"mc f32-accum: {ms:.2f} ms  match={bool(jnp.array_equal(o1, o2))}",
          flush=True)

    # int8 MXU matmul probe
    a = jnp.asarray(rng.integers(-127, 127, (2048, 512), np.int8))
    bmat = jnp.asarray(rng.integers(-127, 127, (512, 512), np.int8))
    f_i8 = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    ms, _ = timeit(f_i8, a, bmat, iters=50)
    gflops = 2 * 2048 * 512 * 512 / (ms / 1e3) / 1e9
    print(f"int8 matmul 2048x512x512: {ms:.3f} ms = {gflops:.0f} GOP/s",
          flush=True)
    af = a.astype(jnp.float32)
    bf = bmat.astype(jnp.float32)
    f_f32 = jax.jit(lambda x, y: x @ y)
    ms, _ = timeit(f_f32, af, bf, iters=50)
    gflops = 2 * 2048 * 512 * 512 / (ms / 1e3) / 1e9
    print(f"f32 matmul  2048x512x512: {ms:.3f} ms = {gflops:.0f} GFLOP/s",
          flush=True)

    # transform_recon split: fDCT+quant vs iDCT
    src = jnp.asarray(rng.integers(0, 255, (B, n, n), np.uint8))
    pred = jnp.asarray(rng.integers(0, 255, (B, n, n), np.uint8))
    dc_q = jnp.asarray(48, jnp.int32)
    ac_q = jnp.asarray(64, jnp.int32)
    from tpu_vp9.bitstream.tables import TxSize, TxType
    from tpu_vp9.ops import txfm

    def fwd_only(s, p):
        resid = (s.astype(jnp.int32) - p.astype(jnp.int32)).astype(
            jnp.float32)
        coeffs = txfm.fwd_txfm2d(resid, TxSize.TX_32X32, TxType.DCT_DCT,
                                 jnp)
        return E._quantize(coeffs, dc_q, ac_q, n)

    f_fwd = jax.jit(fwd_only)
    ms, lv = timeit(f_fwd, src, pred)
    print(f"fDCT32+quant B={B}: {ms:.2f} ms", flush=True)

    def inv_only(levels, p):
        deq = E._dequantize(levels, dc_q, ac_q, n)
        return txfm.inv_txfm_add(deq, p.astype(jnp.int32),
                                 TxSize.TX_32X32, TxType.DCT_DCT, jnp)

    f_inv = jax.jit(inv_only)
    ms, _ = timeit(f_inv, lv, pred)
    print(f"iDCT32+add B={B}: {ms:.2f} ms", flush=True)

    # full transform_recon
    f_tr = jax.jit(lambda s, p: E.transform_recon(s, p, dc_q, ac_q, n,
                                                  want_scan=True))
    ms, _ = timeit(f_tr, src, pred)
    print(f"transform_recon32 B={B}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
