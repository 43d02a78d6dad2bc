"""Decoder-side enhancement tail (DSE).

Reference: layers/TransformRGB.py:16-49 (ReLU variant, RGB decoder) and
models/AutoEncoderMask_Journal.py:16-48 (LeakyReLU variant, mask decoder).
Structure: 1x1 in-conv -> 3 residual enhancement blocks -> long skip ->
1x1 out-conv -> identity skip.

The module owns explicit parameters (paths identical to the child-Conv
layout: input_conv/kernel, enh1/conv1/kernel, ...) so the same tree feeds
either the XLA conv chain (training/parity) or the fused Pallas kernel
(serving; ops/pallas/dse.py) — the 32-channel convs at full resolution are
the single most MXU-hostile op in the model (~6% util under XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY


class _ConvParams(nn.Module):
    k: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kern = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.k, self.k, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.cout,),
                          jnp.float32)
        return {"kernel": kern, "bias": bias}


class _EnhParams(nn.Module):
    filters: int

    @nn.compact
    def __call__(self):
        return {
            "conv1": _ConvParams(3, self.filters, self.filters,
                                 name="conv1")(),
            "conv2": _ConvParams(3, self.filters, self.filters,
                                 name="conv2")(),
        }


def _conv(x, p, policy, pad):
    from .quant import policy_conv
    y = policy_conv(x, p["kernel"], policy, padding=((pad, pad), (pad, pad)))
    return y + p["bias"].astype(policy.compute_dtype)


class EnhancementBlock(nn.Module):
    """Standalone residual enhancement block (kept for API parity)."""

    filters: int = 32
    leaky: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = _EnhParams(self.filters, name="p")()
        y = _conv(x, p["conv1"], self.policy, 1)
        y = jax.nn.leaky_relu(y, 0.01) if self.leaky else jax.nn.relu(y)
        y = _conv(y, p["conv2"], self.policy, 1)
        return x + y


# 4 images x 32 filters = 128 lanes exactly; the gate below and
# dse_packed_xla's default must agree
PACK_GROUPS = 4


def _blockdiag(w, g):
    """(k,k,cin,cout) -> (k,k,g*cin,g*cout) = kron(I_g, w)."""
    k, _, cin, cout = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    wb = jnp.einsum("gh,klio->klgiho", eye, w)
    return wb.reshape(k, k, g * cin, g * cout)


def dse_packed_xla(x, params, policy, leaky, groups: int = PACK_GROUPS):
    """DSE with G images packed into the channel dim (batch B -> B/G,
    C -> G*C) and block-diagonal kron(I_G, w) kernels — same math as
    dse_xla, re-laid-out so the 32-channel convs fill the 128-wide MXU/VPU
    lane tiles instead of padding 4x.

    Measured on v5e (tools/dse_relayout_probe.py, batch 16 @256x384 bf16):
    12.53 ms -> 5.53 ms (2.27x) over the plain chain; the grouped-conv
    (feature_group_count) formulation of the same layout is SLOWER than
    baseline (17.9 ms), so the 4x extra MACs of the dense block-diagonal
    kernel are the price of admission — free, because the chain is
    bandwidth-bound, not MXU-bound.  Pure XLA: differentiable, no Mosaic.
    """
    b, h, w, c = x.shape
    g = groups
    dt = policy.compute_dtype

    def pack(t):
        bb, hh, ww, cc = t.shape
        t = t.reshape(bb // g, g, hh, ww, cc).transpose(0, 2, 3, 1, 4)
        return t.reshape(bb // g, hh, ww, g * cc)

    def unpack(t, cc):
        bg, hh, ww, _ = t.shape
        t = t.reshape(bg, hh, ww, g, cc).transpose(0, 3, 1, 2, 4)
        return t.reshape(bg * g, hh, ww, cc)

    def conv(t, p, pad):
        # int8 note: the block-diag kernel is quantized AFTER kron — its
        # per-output-channel scales equal the original kernel's (each
        # column holds one original column plus exact zeros), so this is
        # bit-identical to quantize-then-blockdiag (tests/test_quant.py)
        from .quant import policy_conv
        wb = _blockdiag(p["kernel"], g)
        y = policy_conv(t, wb, policy, padding=((pad, pad), (pad, pad)))
        return y + jnp.tile(p["bias"].astype(dt), (g,))

    xp = pack(x.astype(dt))
    identity = xp
    first = conv(xp, params["input_conv"], 0)
    y = first
    for k in ("enh1", "enh2", "enh3"):
        z = conv(y, params[k]["conv1"], 1)
        z = jax.nn.leaky_relu(z, 0.01) if leaky else jax.nn.relu(z)
        z = conv(z, params[k]["conv2"], 1)
        y = y + z
    y = y + first
    y = conv(y, params["output_conv"], 0)
    return unpack(y + identity, c)


def dse_xla(x, params, policy, leaky):
    """Plain XLA conv chain (TransformRGB.py:16-49 math) as a pure function
    of the params dict — the training path, and the rematerialized backward
    of the fused kernel."""
    identity = x
    first = _conv(x, params["input_conv"], policy, 0)
    y = first
    for k in ("enh1", "enh2", "enh3"):
        z = _conv(y, params[k]["conv1"], policy, 1)
        z = jax.nn.leaky_relu(z, 0.01) if leaky else jax.nn.relu(z)
        z = _conv(z, params[k]["conv2"], policy, 1)
        y = y + z
    y = y + first
    y = _conv(y, params["output_conv"], policy, 0)
    return y + identity


class DSE(nn.Module):
    in_ch: int = 3
    filters: int = 32
    leaky: bool = False   # mask-codec DSE uses LeakyReLU enhancement blocks
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        params = {
            "input_conv": _ConvParams(1, self.in_ch, self.filters,
                                      name="input_conv")(),
            "enh1": _EnhParams(self.filters, name="enh1")(),
            "enh2": _EnhParams(self.filters, name="enh2")(),
            "enh3": _EnhParams(self.filters, name="enh3")(),
            "output_conv": _ConvParams(1, self.filters, self.in_ch,
                                       name="output_conv")(),
        }

        if self.policy.packed_dse and x.shape[0] % PACK_GROUPS == 0:
            return dse_packed_xla(x, params, self.policy, self.leaky)

        h, w = x.shape[1], x.shape[2]
        if self.policy.fused_dse:
            # (32, 32) tiles with 4-image lane packing (see pallas/dse.py)
            th = 32 if h % 32 == 0 else 0
            tw = 32 if w % 32 == 0 else 0
            if th and tw:
                from .pallas.dse import fused_dse
                from .pallas.remat_vjp import fused_primal_xla_grad
                interpret = jax.default_backend() != "tpu"
                dt = self.policy.compute_dtype
                return fused_primal_xla_grad(
                    lambda xx, pp: fused_dse(xx, pp, leaky=self.leaky,
                                             tile=(th, tw),
                                             interpret=interpret),
                    lambda xx, pp: dse_xla(xx, pp, self.policy,
                                           self.leaky).astype(dt),
                    (x.astype(dt), params))

        return dse_xla(x, params, self.policy, self.leaky)
