"""Rate accounting helpers.

bits = sum(clamp(-log2(likelihood + 1e-10), 0, 50)) — exactly the clamp the
reference applies per symbol (models/AutoEncoderRGB_Journal.py:280-281).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG2 = math.log(2.0)


def rate_bits(likelihoods):
    """Total bits for a likelihood tensor, per-symbol clamped to [0, 50]."""
    bits = jnp.clip(-jnp.log(likelihoods + 1e-10) / _LOG2, 0.0, 50.0)
    return jnp.sum(bits)


def bpp(likelihoods, batch: int, height: int, width: int):
    """Bits-per-pixel over the *input image* resolution
    (AutoEncoderRGB_Journal.py:292-293)."""
    return rate_bits(likelihoods) / (batch * height * width)
