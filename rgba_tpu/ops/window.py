"""Window partition/reverse + Swin shifted-window bias + zero-window gating.

Reference: layers/masked_win_attention.py:6-47,194-217.

The reference's ``remove_zero_windows`` produces a *data-dependent shape*
(masked_win_attention.py:35-47,224) — it gathers only windows whose alpha sum
is non-zero, runs attention on the survivors, and scatters results back into
zeros (:235-237).  XLA requires static shapes, and on TPU the dense
formulation is both simpler and faster for typical mask densities: compute
attention for all windows and multiply the outputs of dead windows by zero.
The result is bit-identical because dropped windows contribute exactly 0
before the residual add.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C), row-major window order."""
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def window_reverse(windows, window_size: int, h: int, w: int):
    """(B*nH*nW, ws, ws, C) -> (B, H, W, C)."""
    ws = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def window_alive(alpha_windows):
    """(nWB, ws, ws, 1) alpha windows -> (nWB,) float gate: 1 if any alpha.

    Mirrors remove_zero_windows (masked_win_attention.py:35-47): a window is
    kept iff the sum of its alpha values is non-zero.
    """
    s = jnp.sum(alpha_windows, axis=(1, 2, 3))
    return (s != 0).astype(alpha_windows.dtype)


@functools.lru_cache(maxsize=64)
def swin_attention_bias(h: int, w: int, window_size: int, shift_size: int):
    """Additive (nW, N, N) attention bias for SW-MSA (0 or -100).

    Static — computed in numpy at trace time, identical to the image-mask
    construction at masked_win_attention.py:194-217 (including the -100.0
    fill value).  Only needed when shift_size > 0.
    """
    ws, ss = window_size, shift_size
    img_mask = np.zeros((h, w), dtype=np.float32)
    h_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    w_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    cnt = 0
    for hs in h_slices:
        for wsl in w_slices:
            img_mask[hs, wsl] = cnt
            cnt += 1
    nh, nw = h // ws, w // ws
    m = img_mask.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    # numpy return: lru_cached + possibly first called inside a jit trace
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # (nW, N, N)


@functools.lru_cache(maxsize=64)
def swin_region_ids(h: int, w: int, window_size: int, shift_size: int):
    """(nW, N) int32 per-window region labels; the additive SW-MSA bias is
    -100 wherever two tokens' labels differ (equivalent to
    swin_attention_bias, used by the fused Pallas kernel)."""
    ws, ss = window_size, shift_size
    img_mask = np.zeros((h, w), dtype=np.int32)
    if ss > 0:
        h_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
        w_slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
        cnt = 0
        for hs in h_slices:
            for wsl in w_slices:
                img_mask[hs, wsl] = cnt
                cnt += 1
    nh, nw = h // ws, w // ws
    m = img_mask.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(m.reshape(-1, ws * ws))


@functools.lru_cache(maxsize=16)
def relative_position_index(window_size: int):
    """(N, N) indices into the (2w-1)^2 relative-position bias table.

    Same construction as masked_win_attention.py:76-86.
    """
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]         # 2, N, N
    rel = rel.transpose(1, 2, 0)                      # N, N, 2
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return np.ascontiguousarray(rel.sum(-1))          # N, N
