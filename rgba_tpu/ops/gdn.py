"""Generalized Divisive Normalization (GDN / IGDN).

y_i = x_i / sqrt(beta_i + sum_j gamma_{ji} x_j^2)   (inverse multiplies)

Reference: layers/GDN.py:26-94. beta/gamma are stored through a sqrt
reparameterization with pedestal 2^-36 and lower-bounded via the
gradient-gated ``lower_bound`` (layers/GDN.py:9-23,46-61,73-79).

TPU notes: the "norm pool" is a 1x1 conv of x^2 — a pure MXU matmul over the
channel dim; XLA fuses square/rsqrt/multiply around it, so the default path
is already one fused HBM pass. Entropy-critical, so accumulation is fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY
from .math import lower_bound

_REPARAM_OFFSET = 2.0 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2


class GDN(nn.Module):
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]

        def beta_init(key, shape, dtype):
            return jnp.sqrt(jnp.ones(shape, dtype) + _PEDESTAL)

        def gamma_init(key, shape, dtype):
            g = self.gamma_init * jnp.eye(ch, dtype=dtype) + _PEDESTAL
            return jnp.sqrt(g)

        beta = self.param("beta", beta_init, (ch,), self.policy.param_dtype)
        gamma = self.param("gamma", gamma_init, (ch, ch), self.policy.param_dtype)

        beta_bound = (self.beta_min + _PEDESTAL) ** 0.5
        beta = lower_bound(beta, beta_bound) ** 2 - _PEDESTAL
        gamma = lower_bound(gamma, _REPARAM_OFFSET) ** 2 - _PEDESTAL

        # norm pool: (x^2) @ gamma  with gamma[j, i] weighting input ch j
        # -> output ch i (torch conv2d with weight gamma.view(ch, ch, 1, 1)
        #    computes out_i = sum_j gamma[i, j] x_j^2; our gamma matmul uses
        #    x2 @ gamma^T to match torch's (out,in) convention).
        dtype = self.policy.compute_dtype
        x = x.astype(dtype)

        if self.policy.fused_gdn:
            from .pallas.gdn import fused_gdn
            from .pallas.remat_vjp import fused_primal_xla_grad
            interpret = jax.default_backend() != "tpu"

            def xla_ref(xx, gt, bt):
                n = jnp.einsum("bhwj,ji->bhwi", jnp.square(xx),
                               gt.astype(dtype),
                               preferred_element_type=jnp.float32,
                               precision=self.policy.precision) + \
                    bt.astype(jnp.float32)
                if dtype != jnp.float32:
                    n = n.astype(dtype)
                s = jnp.sqrt(n) if self.inverse else jax.lax.rsqrt(n)
                return (xx * s).astype(dtype)

            return fused_primal_xla_grad(
                lambda xx, gt, bt: fused_gdn(xx, gt, bt,
                                             inverse=self.inverse,
                                             interpret=interpret),
                xla_ref,
                (x, gamma.T, beta))

        x2 = jnp.square(x)
        norm = jnp.einsum(
            "bhwj,ij->bhwi", x2, gamma.astype(dtype),
            preferred_element_type=jnp.float32,
            precision=self.policy.precision,
        ) + beta.astype(jnp.float32)
        # fp32 policy: exact sqrt/div; bf16 policy: elementwise tail in bf16
        # (the einsum still accumulates fp32) — halves HBM traffic of the
        # three full-res intermediates.
        if dtype == jnp.float32:
            if self.inverse:
                return x * jnp.sqrt(norm)
            return x * jax.lax.rsqrt(norm)
        norm = norm.astype(dtype)
        if self.inverse:
            return x * jnp.sqrt(norm)
        return x * jax.lax.rsqrt(norm)
