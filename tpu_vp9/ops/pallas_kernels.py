"""Pallas TPU kernels for the encoder's hot vector ops.

TPU-native replacements for the reference's AVX2/AVX-512 kernel tier
(SURVEY.md §2.6: ``ASM_AVX2/EbComputeSAD_*`` SAD loop kernels,
``get_eight_horizontal_search_point_results_all85``
``EbMotionEstimation.c:360``).  Where the XLA scan formulation
(pipeline/tpu_me.py) materializes a (D, B, D) SAD tensor in HBM, the
Pallas kernel keeps each block's search entirely in VMEM and reduces to
the argmin on-chip — one (3,) result per block leaves the core.

Kernels fall back to interpret mode off-TPU (tests force this), so the
same code is the scalar oracle and the device kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is part of jax, but guard exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Full-pel SAD exhaustive search, one block per grid program
# ---------------------------------------------------------------------------


def _sad_search_kernel(src_ref, reg_ref, out_ref, *, n: int, r: int):
    """src_ref: (1, n, n) int32; reg_ref: (1, n+2r, n+2r) int32;
    out_ref: (1, 4) int32 -> [dy, dx, sad, 0].

    The column displacements are unrolled statically (D static slices of
    the row band), so the inner reduction is one fused VPU pass over a
    (D, n, n) VMEM tensor per displacement row.
    """
    d = 2 * r + 1
    src = src_ref[0]  # (n, n)

    def dy_body(dy, carry):
        best_sad, best_idx = carry
        rows = reg_ref[0, pl.ds(dy, n), :]  # (n, win)
        wins = jnp.stack([rows[:, dx : dx + n] for dx in range(d)])  # (D,n,n)
        sads = jnp.abs(wins - src[None]).sum(axis=(1, 2))  # (D,)
        row_best = jnp.min(sads)
        row_arg = jnp.argmin(sads).astype(jnp.int32)
        idx = dy * d + row_arg
        take = row_best < best_sad
        return (jnp.where(take, row_best, best_sad),
                jnp.where(take, idx, best_idx))

    init = (jnp.int32(2**31 - 1), jnp.int32(0))
    best_sad, best_idx = jax.lax.fori_loop(0, d, dy_body, init)
    out_ref[0, 0] = best_idx // d - r
    out_ref[0, 1] = best_idx % d - r
    out_ref[0, 2] = best_sad
    out_ref[0, 3] = 0


@functools.partial(jax.jit, static_argnames=("n", "r", "interpret"))
def sad_full_search(src_blocks, regions, n: int, r: int,
                    interpret: bool = False):
    """Exhaustive full-pel SAD search for B blocks at once.

    src_blocks: (B, n, n) uint8; regions: (B, n+2r, n+2r) uint8 with
    displacement (0,0) at region offset (r, r).
    Returns (dy, dx, sad) int32 arrays of shape (B,).
    """
    b = src_blocks.shape[0]
    win = n + 2 * r
    src = src_blocks.astype(jnp.int32)
    reg = regions.astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_sad_search_kernel, n=n, r=r),
        out_shape=jax.ShapeDtypeStruct((b, 4), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, win), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(src, reg)
    return out[:, 0], out[:, 1], out[:, 2]


# ---------------------------------------------------------------------------
# Residual energy map (variance/SSE per 8x8 sub-block) — picture analysis
# ---------------------------------------------------------------------------


def _block_energy_kernel(src_ref, pred_ref, out_ref, *, n: int):
    """SSE and SAD of (src - pred) per (1, n, n) block -> (1, 2) int32."""
    diff = src_ref[0] - pred_ref[0]
    out_ref[0, 0] = jnp.sum(diff * diff)
    out_ref[0, 1] = jnp.sum(jnp.abs(diff))


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def block_energy(src_blocks, pred_blocks, n: int, interpret: bool = False):
    """(SSE, SAD) per block — the distortion kernel of the MD fast loop
    (EbComputeSAD / spatial_full_distortion equivalents)."""
    b = src_blocks.shape[0]
    out = pl.pallas_call(
        functools.partial(_block_energy_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((b, 2), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(src_blocks.astype(jnp.int32), pred_blocks.astype(jnp.int32))
    return out[:, 0], out[:, 1]


# ---------------------------------------------------------------------------
# Fused forward-DCT + quantize + RD-cost proxy (MXU path)
# ---------------------------------------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    mat = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat.astype(np.float32)


def _txq_cost_kernel(resid_ref, dmat_ref, q_ref, out_ref, *, n: int):
    """Float DCT-II + dead-zone quantize + distortion/rate proxies.

    resid_ref: (1, n, n) f32; dmat_ref: (n, n) f32; q_ref: (1, 2) f32
    [dc_q, ac_q]; out_ref: (1, 2) f32 -> [distortion, rate_proxy].
    The two transforms ride the MXU; everything else fuses on the VPU.
    """
    x = resid_ref[0]
    dmat = dmat_ref[:]
    c = jnp.dot(dmat, x, preferred_element_type=jnp.float32)
    coeffs = jnp.dot(c, dmat.T, preferred_element_type=jnp.float32)
    dc_q, ac_q = q_ref[0, 0], q_ref[0, 1]
    qstep = jnp.full((n, n), ac_q, jnp.float32).at[0, 0].set(dc_q)
    levels = jnp.trunc(coeffs / qstep + jnp.sign(coeffs) * 0.38)
    deq = levels * qstep
    err = coeffs - deq
    out_ref[0, 0] = jnp.sum(err * err)
    mags = jnp.abs(levels)
    out_ref[0, 1] = jnp.sum(
        jnp.where(mags > 0, 1.5 + jnp.log2(1.0 + mags), 0.0))


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def txq_cost(resid_blocks, dc_q: float, ac_q: float, n: int,
             interpret: bool = False):
    """Batched transform+quant RD proxy: (distortion, rate) per block.

    The open-loop analogue of the MD full loop's fDCT+Q+cost
    (perform_full_loop, EbEncDecProcess.c:766) used for tx-size and
    partition decisions.
    """
    b = resid_blocks.shape[0]
    dmat = jnp.asarray(_dct_matrix(n))
    q = jnp.broadcast_to(jnp.asarray([[dc_q, ac_q]], jnp.float32), (b, 2))
    out = pl.pallas_call(
        functools.partial(_txq_cost_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((b, 2), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(resid_blocks.astype(jnp.float32), dmat, q)
    return out[:, 0], out[:, 1]
