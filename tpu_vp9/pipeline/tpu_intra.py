"""TPU batched intra analysis: open-loop mode decision + transform/quant.

The reference runs mode decision per-SB inside thread pools
(``EbEncDecProcess.c:1969`` ``eb_vp9_mode_decision_sb``); the TPU-native
formulation evaluates ALL blocks x ALL 10 intra modes at once from
*source* reference samples (the open-loop trick the reference itself uses
via USE_SRC_REF, ``EbEncDecProcess.c:5383``), then the forward transform
runs as batched MXU matmuls.  Output feeds the host (or wavefront)
reconstruction pass, which is closed-loop and conformant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_vp9.bitstream import tables as T
from tpu_vp9.bitstream.tables import IntraMode, TxSize, TxType
from tpu_vp9.ops import intra as intra_ops
from tpu_vp9.ops import txfm


def extract_blocks(plane, n: int):
    """(H, W) -> (R, C, n, n) non-overlapping blocks. H, W multiples of n."""
    h, w = plane.shape
    return plane.reshape(h // n, n, w // n, n).transpose(0, 2, 1, 3)


def openloop_refs(plane, n: int, xp=jnp):
    """Batched source-based reference samples for every nxn block.

    plane: (H, W) uint8, H/W multiples of n, edge-padding already applied
    to the right so 'above-right replicate' falls out naturally.
    Returns (above_ext (R,C,2n), above_left (R,C), left (R,C,n),
             have_above (R,C) bool, have_left (R,C) bool).
    """
    h, w = plane.shape
    rows, cols = h // n, w // n
    p = plane.astype(xp.int32)

    # above rows: for block-row r, the source row r*n - 1 (127 when r == 0)
    row_idx = xp.clip(xp.arange(rows) * n - 1, 0, h - 1)
    above_rows = p[row_idx]  # (R, W)
    above_rows = xp.where((xp.arange(rows) == 0)[:, None], 127, above_rows)

    # above_ext: per block, 2n pixels starting at px (clamped within row,
    # replicating the last column for the rightmost block)
    col_idx = xp.clip(xp.arange(cols)[:, None] * n + xp.arange(2 * n)[None, :],
                      0, w - 1)  # (C, 2n)
    above_ext = above_rows[:, col_idx]  # (R, C, 2n)
    # spec: above-right half replicates above[n-1] for bs > 4 — and our
    # encoder restricts real above-right to none (open-loop MD only), so
    # always replicate:
    above_ext = xp.concatenate(
        [above_ext[..., :n],
         xp.broadcast_to(above_ext[..., n - 1 : n], above_ext[..., :n].shape)],
        axis=-1)

    # left cols: for block-col c, source col c*n - 1 (129 when c == 0)
    lcol_idx = xp.clip(xp.arange(cols) * n - 1, 0, w - 1)
    left_cols = p[:, lcol_idx]  # (H, C)
    left_cols = xp.where((xp.arange(cols) == 0)[None, :], 129, left_cols)
    lrow_idx = (xp.arange(rows)[:, None] * n + xp.arange(n)[None, :])  # (R,n)
    left = left_cols[lrow_idx]  # (R, n, C)
    left = xp.transpose(left, (0, 2, 1))  # (R, C, n)

    # corner: above-left pixel = p[py-1, px-1]; 127 if no above, 129 if
    # above but no left
    al = p[row_idx][:, lcol_idx]  # (R, C)
    have_above = xp.broadcast_to((xp.arange(rows) > 0)[:, None], (rows, cols))
    have_left = xp.broadcast_to((xp.arange(cols) > 0)[None, :], (rows, cols))
    al = xp.where(have_above, xp.where(have_left, al, 129), 127)
    return above_ext, al, left, have_above, have_left


@functools.partial(jax.jit, static_argnames=("n",))
def decide_modes_openloop(plane, qindex, n: int = 32):
    """Open-loop intra mode decision for all nxn blocks of a plane.

    Returns (modes (R, C) int32, sse (R, C) int64-ish, dist+rate cost).
    """
    above_ext, al, left, ha, hl = openloop_refs(plane, n)
    preds = intra_ops.predict_all_modes(above_ext, al, left, ha, hl, n, jnp)
    src = extract_blocks(plane, n).astype(jnp.int32)
    sse = ((preds - src[:, :, None]) ** 2).astype(jnp.int32).sum(axis=(-1, -2))
    # small fixed mode-cost prior (DC/V/H/TM cheaper in the kf trees)
    mode_bias = jnp.array([0, 1, 1, 3, 3, 3, 3, 3, 3, 1], jnp.int32)
    lam = (qindex.astype(jnp.int32) ** 2) // 64 + 1
    cost = sse + mode_bias[None, None, :] * lam
    modes = jnp.argmin(cost, axis=-1).astype(jnp.int32)
    best = jnp.min(cost, axis=-1)
    return modes, sse, best


@functools.partial(jax.jit, static_argnames=("n",))
def transform_quant_blocks(blocks, preds, qindex, n: int = 32):
    """Batched forward transform + quantization of residual blocks.

    blocks, preds: (..., n, n) int32.  Returns (levels, dequant, approx_rate).
    """
    ts = {4: TxSize.TX_4X4, 8: TxSize.TX_8X8, 16: TxSize.TX_16X16,
          32: TxSize.TX_32X32}[n]
    resid = (blocks - preds).astype(jnp.float32)
    coeffs = txfm.fwd_txfm2d(resid, ts, TxType.DCT_DCT, jnp)
    dc_q = jnp.asarray(T.tbl("dc_qlookup"), jnp.float32)[qindex]
    ac_q = jnp.asarray(T.tbl("ac_qlookup"), jnp.float32)[qindex]
    q = jnp.full((n, n), ac_q, jnp.float32).at[0, 0].set(dc_q)
    if n == 32:
        q = q * 0.5
    levels = jnp.floor(jnp.abs(coeffs) / q + 0.38).astype(jnp.int32)
    levels = jnp.where(coeffs < 0, -levels, levels)
    deq = (jnp.abs(levels) * q.astype(jnp.int32)).astype(jnp.int32)
    deq = jnp.where(levels < 0, -deq, deq)
    # crude rate proxy: nonzero count + log2 magnitude sum (for RC stats)
    nz = (levels != 0).sum(axis=(-1, -2))
    mag = jnp.log2(1.0 + jnp.abs(levels).sum(axis=(-1, -2)).astype(jnp.float32))
    return levels, deq, nz.astype(jnp.float32) * 4 + mag


def analyze_frame_stats(plane, qindex, n: int = 32):
    """Full open-loop analysis step: modes + rate/dist stats (one device)."""
    modes, sse, cost = decide_modes_openloop(plane, qindex, n)
    return {"modes": modes, "sse": sse, "cost": cost}


def intra_encode_step(plane, qindex, n: int = 32):
    """One full open-loop intra analysis step for a single plane:
    mode decision + chosen prediction + transform/quant + rate stats.

    plane: (H, W) uint8/int32 (H, W multiples of n).
    Returns (modes (R,C), levels (R,C,n,n), rate (R,C), dist (R,C)).
    Jittable; this is the flagship TPU compute graph (gathers + MXU
    matmuls + VPU) behind the encoder's analysis phase.
    """
    above_ext, al, left, ha, hl = openloop_refs(plane, n)
    preds = intra_ops.predict_all_modes(above_ext, al, left, ha, hl, n, jnp)
    src = extract_blocks(plane, n).astype(jnp.int32)
    sse = ((preds - src[:, :, None]) ** 2).astype(jnp.int32).sum(axis=(-1, -2))
    mode_bias = jnp.array([0, 1, 1, 3, 3, 3, 3, 3, 3, 1], jnp.int32)
    lam = (qindex.astype(jnp.int32) ** 2) // 64 + 1
    modes = jnp.argmin(sse + mode_bias[None, None, :] * lam, axis=-1)
    chosen = jnp.take_along_axis(
        preds, modes[..., None, None, None], axis=2)[:, :, 0]
    levels, deq, rate = transform_quant_blocks(src, chosen, qindex, n)
    # distortion proxy: transform-domain quantization error energy
    # (Parseval up to the 2-D transform gain of 8)
    resid = (src - chosen).astype(jnp.float32)
    ts = {4: TxSize.TX_4X4, 8: TxSize.TX_8X8, 16: TxSize.TX_16X16,
          32: TxSize.TX_32X32}[n]
    coeffs = txfm.fwd_txfm2d(resid, ts, TxType.DCT_DCT, jnp)
    qerr = coeffs - deq.astype(jnp.float32)
    dist = (qerr**2).sum(axis=(-1, -2)) / 64.0
    return modes.astype(jnp.int32), levels, rate, dist


def multi_frame_step(planes, qindex, n: int = 32):
    """Batched-over-frames analysis step + global RC stats reduction.

    planes: (F, H, W).  The reduction over the (sharded) block grid makes
    XLA insert cross-device collectives (the RC psum of SURVEY.md §7.1).
    """
    step = jax.vmap(lambda p: intra_encode_step(p, qindex, n))
    modes, levels, rate, dist = step(planes)
    total_rate = rate.sum()
    total_dist = dist.sum()
    return modes, levels, total_rate, total_dist
