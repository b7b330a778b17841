"""TPU batched motion search.

The reference's ME is per-SB SAD loops over thread pools
(``EbMotionEstimation.c:951`` full_pel_search_sb).  The TPU-native
formulation evaluates ALL blocks' full search windows at once as
grouped cross-correlations on the MXU:

    SSE(d) = ||src||^2 - 2 <src, win_d> + ||win_d||^2

The correlation term is a grouped conv (one block = one group); the
window-energy term is a grouped conv of the squared region with an
all-ones kernel.  SSE-based selection slightly beats SAD quality-wise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n", "r"))
def full_search_sse(src_blocks, regions, n: int, r: int):
    """src_blocks: (B, n, n) uint8; regions: (B, n+2r, n+2r) uint8
    (search window centered: displacement (0,0) at region offset (r, r)).

    Returns (dy (B,), dx (B,), sad (B,)) for the best displacement in
    [-r, r]^2.  Formulated as a scan over displacement rows with the
    column displacements vectorized — plain fused VPU ops (the grouped
    conv formulation lowers poorly on TPU: one tiny conv per block).
    """
    b = src_blocks.shape[0]
    d = 2 * r + 1
    src = src_blocks.astype(jnp.int32)  # (B, n, n)
    reg = regions.astype(jnp.int32)
    xidx = jnp.arange(d)[:, None] + jnp.arange(n)[None, :]  # (D, n)

    def step(carry, dy):
        rows = jax.lax.dynamic_slice_in_dim(reg, dy, n, axis=1)  # (B,n,W)
        wins = rows[:, :, xidx]  # (B, n, D, n)
        sad = jnp.abs(wins - src[:, :, None, :]).sum(axis=(1, 3))  # (B, D)
        return carry, sad

    _, sads = jax.lax.scan(step, None, jnp.arange(d))  # (D, B, D)
    flat = sads.transpose(1, 0, 2).reshape(b, -1)
    idx = jnp.argmin(flat, axis=1)
    dy = idx // d - r
    dx = idx % d - r
    return dy.astype(jnp.int32), dx.astype(jnp.int32), jnp.min(flat, axis=1)


@functools.partial(jax.jit, static_argnames=("n", "r"))
def _prep_blocks_regions(src_plane, ref_region, n: int, r: int):
    """On-device tiling: (R*C, n, n) source blocks + (R*C, n+2r, n+2r)
    search windows gathered from the (H+2r, W+2r) reference region —
    replaces a per-block host copy loop with one fused device gather."""
    h, w = src_plane.shape
    rows, cols = h // n, w // n
    blocks = src_plane.reshape(rows, n, cols, n).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(-1, n, n)
    win = n + 2 * r
    ir = (jnp.arange(rows) * n)[:, None] + jnp.arange(win)[None, :]
    ic = (jnp.arange(cols) * n)[:, None] + jnp.arange(win)[None, :]
    regions = ref_region[ir[:, None, :, None], ic[None, :, None, :]]
    return blocks, regions.reshape(-1, win, win)


# device copies of reference search regions, keyed by the host array's
# identity (DPB planes are reused across many frames; upload once)
_REF_CACHE: dict = {}


def tpu_block_motion(src_plane, ref_padded, border: int, n: int, r: int):
    """Full-pel MVs for every nxn block of a plane via one device call.

    src_plane: (H, W) uint8 with H, W multiples of n;
    ref_padded: border-extended reference.  Returns (R, C, 2) int numpy.
    """
    h, w = src_plane.shape
    rows, cols = h // n, w // n
    assert r <= border
    key = (id(ref_padded), h, w, r)
    ent = _REF_CACHE.get(key)
    if ent is None or ent[0] is not ref_padded:
        region_np = np.ascontiguousarray(
            ref_padded[border - r : border + h + r,
                       border - r : border + w + r])
        ent = (ref_padded, jnp.asarray(region_np))
        if len(_REF_CACHE) >= 8:  # bound device memory pinned by cache
            _REF_CACHE.pop(next(iter(_REF_CACHE)))
        _REF_CACHE[key] = ent
    blocks, regions = _prep_blocks_regions(jnp.asarray(src_plane), ent[1],
                                           n, r)
    dy = dx = None
    try:
        # Pallas kernel: per-block search stays in VMEM (no (D,B,D) HBM
        # round trip); falls back to the XLA scan formulation on any
        # lowering trouble.
        import jax as _jax

        if _jax.devices()[0].platform == "tpu":
            from tpu_vp9.ops.pallas_kernels import sad_full_search

            dy, dx, _ = sad_full_search(blocks, regions, n, r)
    except Exception:
        dy = dx = None
    if dy is None:
        dy, dx, _ = full_search_sse(blocks, regions, n, r)
    out = np.stack([np.asarray(dy), np.asarray(dx)], axis=-1)
    return out.reshape(rows, cols, 2)
