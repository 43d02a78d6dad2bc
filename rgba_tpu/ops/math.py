"""Small differentiable primitives.

* ``lower_bound`` — max(x, bound) with the gradient-gating rule of the
  reference's custom autograd Function (layers/GDN.py:9-23): the gradient
  passes through iff ``x >= bound`` OR the incoming cotangent is negative
  (i.e. the step would push x upward, back into the feasible set).
* ``ste_round`` — straight-through rounding (models/AutoEncoderRGB_Journal.py:31).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound,)


def _lower_bound_bwd(res, g):
    (above,) = res
    pass_through = jnp.logical_or(above, g < 0)
    return (jnp.where(pass_through, g, 0.0).astype(g.dtype), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def ste_round(x):
    """round(x) in the forward pass, identity gradient in the backward pass."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)
