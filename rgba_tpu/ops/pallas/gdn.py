"""Pallas TPU kernel: fused GDN/IGDN (BASELINE north-star bullet).

GDN is one (M, C) x (C, C) norm-pool matmul wrapped in elementwise work
(square before, +beta / rsqrt / multiply after).  XLA's lowering measured
5.6 ms at (16, 256, 384, 192) bf16 against a 3.3 ms read-x-once /
write-y-once HBM floor — it spills the x^2 intermediate.  This kernel
keeps the whole chain VMEM-resident per row-block: HBM is touched once
for x and once for y.  No halos, no patch assembly — the fusion-friendly
shape class where Pallas beats XLA on v5e (unlike the conv chains, see
PERFORMANCE.md round-2 ladder).

The beta/gamma lower_bound reparameterization (GDN.py:46-61) stays
OUTSIDE the kernel in XLA: it is (C,)/(C, C)-sized, and keeping it
outside lets the remat-VJP training path propagate its gradient gate
exactly.

Reference math: layers/GDN.py:26-94 — y_i = x_i / sqrt(beta_i +
sum_j gamma_ij x_j^2) (inverse multiplies by the sqrt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, b_ref, o_ref, *, inverse: bool):
    x = x_ref[...]
    x2 = jnp.square(x)
    norm = jnp.dot(x2, g_ref[...],
                   preferred_element_type=jnp.float32) + b_ref[...]
    norm = jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm)
    o_ref[...] = (x.astype(jnp.float32) * norm).astype(o_ref.dtype)


def _pick_rows(m):
    for r in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if m % r == 0:
            return r
    return 0


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def fused_gdn(x, gamma_t, beta, *, inverse: bool = False,
              interpret: bool = False):
    """x: (B, H, W, C); gamma_t: (C, C) post-reparam, already transposed so
    norm = x2 @ gamma_t (column i weights output channel i); beta: (C,)
    post-reparam fp32.  Returns same shape/dtype as x."""
    b, h, w, c = x.shape
    m = b * h * w
    rows = _pick_rows(m)
    assert rows, m
    xf = x.reshape(m, c)
    out = pl.pallas_call(
        functools.partial(_kernel, inverse=inverse),
        grid=(m // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(xf, gamma_t.astype(x.dtype), beta.astype(jnp.float32))
    return out.reshape(b, h, w, c)
