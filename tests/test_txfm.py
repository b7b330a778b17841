"""Transform correctness tests.

The integer inverse transforms are validated three ways:
1. against ideal float DCT-II/ADST mathematics (catches wiring errors),
2. forward->quant(1)->inverse roundtrip reproduces residuals,
3. numpy(int64) and jax.numpy(int32) paths are bit-identical.
"""

import numpy as np
import pytest

from tpu_vp9.bitstream.tables import TxSize, TxType
from tpu_vp9.ops import txfm

SIZES = [TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16, TxSize.TX_32X32]


def ideal_idct_matrix(n):
    # DCT-III (inverse of DCT-II), orthonormal, scaled by sqrt(2) per VP9 1-D
    k = np.arange(n)
    mat = np.cos(np.pi * (2 * k[None, :].T + 1) * k[None, :] / (2 * n))
    mat[:, 0] *= 1 / np.sqrt(2)
    return mat * np.sqrt(2.0 / n) * np.sqrt(2) ** (np.log2(n) - 1) * 2


def test_idct_matches_float_dct():
    # The integer 1-D idct approximates a scaled DCT-III; verify the
    # measured matrix is column-orthogonal with the expected uniform scale.
    for n in (4, 8, 16, 32):
        a = txfm._inv_matrix(n, adst=False)
        g = a.T @ a  # should be ~ scale^2 * I
        scale = np.sqrt(np.diag(g).mean())
        np.testing.assert_allclose(
            g / scale**2, np.eye(n), atol=2e-3,
            err_msg=f"idct{n} not orthogonal")
        # VP9 1-D gain is sqrt(n/2); with the final >>shift this yields a
        # 2-D gain of 1/8 (1/4 for 32x32, compensated by the >>1 dequant).
        np.testing.assert_allclose(scale, np.sqrt(n / 2), rtol=1e-3)


def test_iadst_matches_float():
    for n in (4, 8, 16):
        a = txfm._inv_matrix(n, adst=True)
        g = a.T @ a
        scale = np.sqrt(np.diag(g).mean())
        np.testing.assert_allclose(
            g / scale**2, np.eye(n), atol=4e-3,
            err_msg=f"iadst{n} not orthogonal")


@pytest.mark.parametrize("ts", SIZES)
@pytest.mark.parametrize("tt", list(TxType))
def test_fwd_inv_roundtrip(ts, tt):
    if ts == TxSize.TX_32X32 and tt != TxType.DCT_DCT:
        pytest.skip("32x32 is DCT only")
    n = txfm.TX_N[ts]
    rng = np.random.default_rng(int(ts) * 7 + int(tt))
    pred = rng.integers(0, 255, size=(3, n, n)).astype(np.uint8)
    target = rng.integers(0, 255, size=(3, n, n)).astype(np.uint8)
    resid = target.astype(np.int64) - pred.astype(np.int64)
    coeffs = np.round(txfm.fwd_txfm2d(resid, ts, tt)).astype(np.int64)
    recon = txfm.inv_txfm_add(coeffs, pred, ts, tt)
    err = recon.astype(int) - target.astype(int)
    assert np.abs(err).max() <= 1, f"max err {np.abs(err).max()}"
    assert np.abs(err).mean() < 0.2


@pytest.mark.parametrize("ts", SIZES)
def test_numpy_jax_bit_exact(ts):
    import jax.numpy as jnp

    n = txfm.TX_N[ts]
    rng = np.random.default_rng(0)
    # realistic dequantized coefficient magnitudes
    coeffs = rng.integers(-8000, 8000, size=(4, n, n)).astype(np.int64)
    coeffs[:, n // 2:, :] = 0
    out_np = txfm.inv_txfm2d(coeffs, ts, TxType.DCT_DCT, np)
    out_j = txfm.inv_txfm2d(
        jnp.asarray(coeffs, dtype=jnp.int32), ts, TxType.DCT_DCT, jnp)
    np.testing.assert_array_equal(out_np, np.asarray(out_j).astype(np.int64))


def test_hybrid_jax_bit_exact():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    for ts in (TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16):
        for tt in (TxType.ADST_DCT, TxType.DCT_ADST, TxType.ADST_ADST):
            n = txfm.TX_N[ts]
            coeffs = rng.integers(-4000, 4000, size=(2, n, n)).astype(np.int64)
            a = txfm.inv_txfm2d(coeffs, ts, tt, np)
            b = txfm.inv_txfm2d(jnp.asarray(coeffs, jnp.int32), ts, tt, jnp)
            np.testing.assert_array_equal(a, np.asarray(b).astype(np.int64))


def test_dc_only_path():
    # decoder DC-shortcut equivalence: general path on DC-only input
    for ts in SIZES:
        n = txfm.TX_N[ts]
        coeffs = np.zeros((1, n, n), dtype=np.int64)
        coeffs[0, 0, 0] = 1000
        pred = np.full((1, n, n), 128, dtype=np.uint8)
        out = txfm.inv_txfm_add(coeffs, pred, ts, TxType.DCT_DCT)
        assert len(np.unique(out)) == 1  # flat DC offset everywhere


def test_quant_dequant_roundtrip():
    rng = np.random.default_rng(3)
    for ts in SIZES:
        n = txfm.TX_N[ts]
        coeffs = rng.normal(0, 500, size=(5, n, n)).astype(np.float32)
        dc_q, ac_q = 40, 50
        levels = txfm.quantize_block(coeffs, dc_q, ac_q, ts)
        deq = txfm.dequant_block(levels, dc_q, ac_q, ts)
        step = np.full((n, n), ac_q, dtype=np.float64)
        step[0, 0] = dc_q
        if n == 32:
            step /= 2
        assert np.all(np.abs(deq - coeffs) <= step * 1.01 + 1)


def test_dequant_sign_symmetry():
    # magnitude-first dequant: dequant(-l) == -dequant(l) (incl. 32x32 >>1)
    for ts in SIZES:
        n = txfm.TX_N[ts]
        levels = np.zeros((1, n, n), dtype=np.int32)
        levels[0, 0, 1] = 3
        levels[0, 0, 2] = -3
        deq = txfm.dequant_block(levels, 41, 41, ts)
        assert deq[0, 0, 1] == -deq[0, 0, 2]


def test_iwht_lossless_roundtrip():
    # lossless: fwht (inverse of iwht) roundtrip must be exact
    rng = np.random.default_rng(5)
    pred = rng.integers(0, 255, size=(2, 4, 4)).astype(np.uint8)
    target = rng.integers(0, 255, size=(2, 4, 4)).astype(np.uint8)
    resid = target.astype(np.int64) - pred.astype(np.int64)
    coeffs = txfm.fwht4x4(resid)
    recon = txfm.iwht4x4_add(coeffs.astype(np.int64), pred)
    np.testing.assert_array_equal(recon, target)
