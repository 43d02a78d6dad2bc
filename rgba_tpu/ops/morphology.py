"""Isolated-pixel cleanup of the reconstructed alpha mask (``constraint``).

Two variants exist in the reference and they differ:
  * RGB driver (trainRGB.py:98-111): a *binary-aware* rule —
      pixels that are exactly 0 with all-8 neighbors == 1-sum 8 become 1;
      pixels  > 0 whose 8-neighborhood sums to 0 become 0.
  * mask driver (trainmask.py:133-146): only the neighbor sums are tested
      (neighbors_sum == 8 -> 1, neighbors_sum == 0 -> 0), regardless of the
      center value.

Both operate on a (B, 1, H, W) torch tensor via a 3x3 ring kernel conv with
padding 1; here on (B, H, W, 1) NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RING = jnp.array(
    [[1.0, 1.0, 1.0],
     [1.0, 0.0, 1.0],
     [1.0, 1.0, 1.0]], dtype=jnp.float32
).reshape(3, 3, 1, 1)


def _neighbor_sum(mask):
    return jax.lax.conv_general_dilated(
        mask.astype(jnp.float32), _RING,
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def constraint_rgb(mask):
    """trainRGB.py:98-111 variant (center-value aware)."""
    ns = _neighbor_sum(mask)
    isolated_zeros = (mask == 0) & (ns == 8)
    isolated_ones = (mask > 0) & (ns == 0)
    mask = jnp.where(isolated_zeros, 1.0, mask)
    mask = jnp.where(isolated_ones, 0.0, mask)
    return mask


def constraint_mask(mask):
    """trainmask.py:133-146 variant (neighbor-sum only)."""
    ns = _neighbor_sum(mask)
    mask = jnp.where(ns == 8, 1.0, mask)
    mask = jnp.where(ns == 0, 0.0, mask)
    return mask
