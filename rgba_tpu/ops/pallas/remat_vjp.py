"""Make the inference Pallas kernels trainable.

Pattern: primal = fused kernel (one HBM pass, VMEM-resident chain),
backward = jax.vjp of the plain XLA formulation, rematerialized from the
saved *inputs* — the flash-attention recipe on TPU.  Nothing intermediate
is saved, so the fused forward keeps its memory profile, and backward
costs one extra XLA forward (which XLA fuses with the cotangent graph).

The fused primal differs from the XLA primal only by bf16 rounding
(parity-tested in tests/test_pallas_*.py); the returned gradients are the
exact gradients of the XLA formulation evaluated at the same inputs.
This keeps optimizer steps consistent: a first-order method cannot tell a
kernel whose |fused - xla| is below the bf16 resolution apart from the
rounding noise it already absorbs.

Reference analog: the torch reference has no fused kernels at all (every
layer autograds through eager CUDA ops, e.g. Masked_Attention.py:150-169);
this module is what makes the TPU-native fused paths available to the
training loop rather than being serving-only.
"""

from __future__ import annotations

import jax


def fused_primal_xla_grad(fused_fn, xla_fn, args):
    """Run `fused_fn(*args)` with gradients from `xla_fn(*args)`.

    args: tuple of differentiable inputs (arrays or pytrees thereof).
    Non-differentiable operands (integer ids, boolean gates) must be
    closed over by the callables, behind jax.lax.stop_gradient if traced.
    Both callables must map identical input trees to an identical output
    tree shape.
    """

    @jax.custom_vjp
    def f(a):
        return fused_fn(*a)

    def fwd(a):
        return fused_fn(*a), a

    def bwd(a, g):
        _, vjp = jax.vjp(lambda inner: xla_fn(*inner), a)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(args)
