"""SSIM / MS-SSIM and the alpha-masked MS-SSIM variant, NHWC, pure JAX.

Plain version mirrors metrics/ms_ssim_torch.py (the one the eval driver
imports, trainRGB.py:8): separable 11-tap Gaussian (sigma 1.5), valid conv,
5 levels, weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], per-level 2x2
avg-pool with odd-size padding; msssim = prod(cs_l^w_l, l<L) * ssim_L^w_L.

Masked version mirrors metrics/masked_ms_ssim_torch.py: per level the
images are multiplied by the binarized mask, the SSIM/CS maps are averaged
only over positions whose nearest-resized mask is non-zero (:103-116), cs
and the final ssim are ReLU'd (:252,258), and the mask is avg-pooled along
with the pyramid (:256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=8)
def _gauss_kernel(size: int, sigma: float):
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    # return numpy, not jnp: this function is lru_cached and may first be
    # called inside a jit trace — caching a traced constant leaks tracers
    return g.astype(np.float32)


def _blur(x, win):
    """Separable valid-conv Gaussian blur, per channel. x: (B, H, W, C)."""
    c = x.shape[-1]
    k = win.shape[0]
    win = jnp.asarray(win)
    kh = win.reshape(k, 1, 1, 1)
    kw = win.reshape(1, k, 1, 1)
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = jnp.tile(kw, (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_maps(x, y, win, data_range):
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu1 = _blur(x, win)
    mu2 = _blur(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _blur(x * x, win) - mu1_sq
    sigma2_sq = _blur(y * y, win) - mu2_sq
    sigma12 = _blur(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map, cs_map


def _avg_pool_2(x):
    """F.avg_pool2d(kernel=2, padding=(H%2, W%2)) with count_include_pad."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return s / 4.0


def ssim(x, y, data_range: float = 1.0, win_size: int = 11,
         win_sigma: float = 1.5, size_average: bool = True):
    """x, y: (B, H, W, C)."""
    win = _gauss_kernel(win_size, win_sigma)
    ssim_map, _ = _ssim_maps(x.astype(jnp.float32), y.astype(jnp.float32),
                             win, data_range)
    val = jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(val) if size_average else val


def ms_ssim(x, y, data_range: float = 1.0, win_size: int = 11,
            win_sigma: float = 1.5, size_average: bool = True,
            weights=_WEIGHTS):
    """x, y: (B, H, W, C). Smallest side must exceed (win-1) * 2^4."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = _gauss_kernel(win_size, win_sigma)
    w = jnp.asarray(weights, jnp.float32)
    levels = len(weights)
    mcs = []
    ssim_val = None
    for lvl in range(levels):
        ssim_map, cs_map = _ssim_maps(x, y, win, data_range)
        ssim_val = jnp.mean(ssim_map, axis=(1, 2, 3))     # (B,)
        mcs.append(jnp.mean(cs_map, axis=(1, 2, 3)))
        if lvl < levels - 1:
            x = _avg_pool_2(x)
            y = _avg_pool_2(y)
    mcs_stack = jnp.stack(mcs[:-1], axis=0)               # (L-1, B)
    # Reference quirk kept verbatim (ms_ssim_torch.py:189-190): the
    # ssim^w_last factor sits INSIDE the prod over the L-1 cs levels, so it
    # is applied L-1 times: msssim = prod(cs_l^w_l) * ssim^((L-1)*w_last).
    val = jnp.prod(mcs_stack ** w[:-1, None] * ssim_val ** w[-1], axis=0)
    return jnp.mean(val) if size_average else val


def _nearest_shrink(mask, out_h, out_w):
    """Nearest-neighbor resize (torchvision InterpolationMode.NEAREST):
    src index = floor(dst * in/out)."""
    in_h, in_w = mask.shape[1], mask.shape[2]
    ih = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    iw = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    return mask[:, ih][:, :, iw]


def masked_ms_ssim(x, y, mask, data_range: float = 1.0, win_size: int = 11,
                   win_sigma: float = 1.5, size_average: bool = True,
                   weights=_WEIGHTS):
    """MS-SSIM over the alpha-visible region only.

    x, y: (B, H, W, C); mask: (B, H, W, 1) alpha.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    win = _gauss_kernel(win_size, win_sigma)
    w = jnp.asarray(weights, jnp.float32)
    levels = len(weights)
    eps = 1e-10
    one_win = win_size - 1
    mcs = []
    ssim_pc = None
    for lvl in range(levels):
        mbin = (mask > 0.0).astype(jnp.float32)
        x = x * mbin
        y = y * mbin
        ssim_map, cs_map = _ssim_maps(x, y, win, data_range)
        mh, mw = mbin.shape[1] - one_win, mbin.shape[2] - one_win
        msmall = _nearest_shrink(mbin, mh, mw)
        nz = (msmall > 0.0).astype(jnp.float32)            # (B, h, w, 1)
        denom = jnp.sum(nz, axis=(1, 2)) + eps             # (B, 1)
        ssim_pc = jnp.sum(ssim_map * nz, axis=(1, 2)) / denom   # (B, C)
        cs_pc = jnp.sum(cs_map * nz, axis=(1, 2)) / denom
        if lvl < levels - 1:
            mcs.append(jax.nn.relu(cs_pc))
            x = _avg_pool_2(x)
            y = _avg_pool_2(y)
            mask = _avg_pool_2(mbin)
    stack = jnp.stack(mcs + [jax.nn.relu(ssim_pc)], axis=0)  # (L, B, C)
    val = jnp.prod(stack ** w[:, None, None], axis=0)        # (B, C)
    val = jnp.mean(val, axis=1)
    return jnp.mean(val) if size_average else val
