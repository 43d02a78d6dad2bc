"""Multiscale alpha-mask pyramid.

Six levels of AvgPool(3x3, stride 2, pad 1) applied to the alpha matte
(reference layers/SupplyMask.py:7-18).  NHWC, stateless function instead of a
parameterless nn.Module.
"""

from __future__ import annotations

import jax


def _avg_pool_3x3_s2(x):
    """torch AvgPool2d(3, stride=2, padding=1) with count_include_pad=True."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / 9.0


def mask_pyramid(mask, levels: int = 6):
    """Return [H/2, H/4, H/8, H/16, H/32, H/64] average-pooled masks.

    mask: (B, H, W, 1) alpha in [0, 1].
    """
    out = []
    x = mask
    for _ in range(levels):
        x = _avg_pool_3x3_s2(x)
        out.append(x)
    return tuple(out)
