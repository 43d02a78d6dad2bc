import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.ops.window import (
    relative_position_index,
    swin_attention_bias,
    window_alive,
    window_partition,
    window_reverse,
)
from rgba_tpu.ops.mask_pyramid import mask_pyramid
from rgba_tpu.ops.morphology import constraint_rgb, constraint_mask


def test_partition_reverse_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24, 5))
    w = window_partition(x, 8)
    assert w.shape == (2 * 2 * 3, 8, 8, 5)
    back = window_reverse(w, 8, 16, 24)
    np.testing.assert_array_equal(back, x)


def test_partition_window_ordering():
    # pixel (h, w) lands in window (h//ws)*nW + (w//ws), position (h%ws, w%ws)
    h, w, ws = 8, 12, 4
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    wins = np.asarray(window_partition(x, ws))
    for hh in range(h):
        for ww in range(w):
            widx = (hh // ws) * (w // ws) + (ww // ws)
            assert wins[widx, hh % ws, ww % ws, 0] == hh * w + ww


def test_window_alive():
    a = jnp.zeros((3, 4, 4, 1))
    a = a.at[1, 2, 2, 0].set(0.5)
    np.testing.assert_array_equal(window_alive(a), [0.0, 1.0, 0.0])


def test_swin_bias_structure():
    ws, ss = 4, 2
    bias = np.asarray(swin_attention_bias(8, 8, ws, ss))
    assert bias.shape == (4, ws * ws, ws * ws)
    # interior window (index 0) has no cross-region pairs: all-zero bias
    np.testing.assert_array_equal(bias[0], 0.0)
    # all values are 0 or -100
    assert set(np.unique(bias)) <= {0.0, -100.0}
    # diagonal is always 0 (a token attends to itself)
    for k in range(4):
        np.testing.assert_array_equal(np.diag(bias[k]), 0.0)
    # boundary windows must block some pairs
    assert (bias[1] == -100.0).any() and (bias[3] == -100.0).any()


def test_relative_position_index():
    ws = 3
    idx = np.asarray(relative_position_index(ws))
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2
    # self-pairs all map to the center entry of the table
    center = (ws - 1) * (2 * ws - 1) + (ws - 1)
    np.testing.assert_array_equal(np.diag(idx), center)
    # translation invariance: same displacement -> same index
    assert idx[0, 1] == idx[1, 2] == idx[3, 4]


def test_mask_pyramid_values():
    # avg pool 3x3 s2 p1, count_include_pad=True (SupplyMask.py:10)
    m = jnp.ones((1, 8, 8, 1))
    levels = mask_pyramid(m, levels=3)
    assert [l.shape[1] for l in levels] == [4, 2, 1]
    l1 = np.asarray(levels[0])
    # corner pixel sees 4 ones of 9 cells; edges 6/9; interior 9/9
    np.testing.assert_allclose(l1[0, 0, 0, 0], 4 / 9, rtol=1e-6)
    np.testing.assert_allclose(l1[0, 0, 1, 0], 6 / 9, rtol=1e-6)
    np.testing.assert_allclose(l1[0, 1, 1, 0], 1.0, rtol=1e-6)


def test_constraint_rgb_golden():
    m = np.zeros((1, 5, 5, 1), dtype=np.float32)
    m[0, 2, 2, 0] = 1.0              # isolated one -> removed
    m[0, 0, 0, 0] = 1.0              # corner one, isolated -> removed
    out = np.asarray(constraint_rgb(jnp.asarray(m)))
    assert out[0, 2, 2, 0] == 0.0
    assert out[0, 0, 0, 0] == 0.0

    m2 = np.ones((1, 5, 5, 1), dtype=np.float32)
    m2[0, 2, 2, 0] = 0.0             # isolated zero in solid ones -> filled
    out2 = np.asarray(constraint_rgb(jnp.asarray(m2)))
    assert out2[0, 2, 2, 0] == 1.0
    # the neighbours of the hole had ns == 7 -> untouched
    assert out2[0, 2, 1, 0] == 1.0


def test_constraint_mask_golden():
    m = np.ones((1, 5, 5, 1), dtype=np.float32) * 0.5
    out = np.asarray(constraint_mask(jnp.asarray(m)))
    # neighbor sums are 1.5 (corner), 2.5 (edge), 4.0 (interior): none hit
    # the ==8 / ==0 triggers, mask unchanged
    np.testing.assert_array_equal(out, m)

    m2 = np.ones((1, 5, 5, 1), dtype=np.float32)
    m2[0, 2, 2, 0] = 0.3             # neighbors all 1 -> ns == 8 -> set to 1
    out2 = np.asarray(constraint_mask(jnp.asarray(m2)))
    assert out2[0, 2, 2, 0] == 1.0
