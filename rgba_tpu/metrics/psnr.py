"""PSNR helpers (trainRGB.py:305: psnr = 10 * log10(1 / mse))."""

from __future__ import annotations

import jax.numpy as jnp


def psnr_from_mse(mse, data_range: float = 1.0):
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def psnr(x, y, data_range: float = 1.0):
    return psnr_from_mse(jnp.mean(jnp.square(x - y)), data_range)
