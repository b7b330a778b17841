"""Hierarchical motion estimation (ops/hme.py)."""

import numpy as np

from tpu_vp9.ops import hme, inter as inter_ops


def test_downsample2x_box_average():
    p = np.arange(16, dtype=np.uint8).reshape(4, 4)
    d = hme.downsample2x(p)
    assert d.shape == (2, 2)
    assert d[0, 0] == round((0 + 1 + 4 + 5 + 2) / 4 - 0.01)  # (sum+2)>>2
    # odd-size replication
    d2 = hme.downsample2x(np.ones((3, 5), np.uint8) * 7)
    assert d2.shape == (2, 3) and (d2 == 7).all()


def test_hme_finds_large_displacement():
    rng = np.random.default_rng(11)
    BORDER = 96
    H = W = 256
    tex = rng.integers(0, 255, (H, W)).astype(np.uint8)
    ref = inter_ops.extend_borders(tex, W, H, BORDER)
    # source block = reference content displaced by (dy, dx) = (-40, 36)
    py, px = 96, 104
    dy_true, dx_true = -40, 36
    src = tex[py + dy_true : py + dy_true + 32,
              px + dx_true : px + dx_true + 32]
    pyr = hme.build_pyramid(ref)
    dy, dx, sad = hme.hme_search(src, pyr, px, py, BORDER, 48)
    assert (dy, dx) == (dy_true, dx_true)
    assert sad == 0


def test_hme_small_block_falls_back():
    rng = np.random.default_rng(3)
    BORDER = 96
    ref = rng.integers(0, 255, (64 + 2 * BORDER, 64 + 2 * BORDER)) \
             .astype(np.uint8)
    src = ref[BORDER + 8 : BORDER + 12, BORDER + 8 : BORDER + 12]
    pyr = hme.build_pyramid(ref)
    dy, dx, sad = hme.hme_search(src, pyr, 8, 8, BORDER, 16)
    assert (dy, dx, sad) == (0, 0, 0)
