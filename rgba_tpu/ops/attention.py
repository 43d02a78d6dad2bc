"""Masked window attention — the paper's core op — plus the gate wrappers.

Reference:
  * WindowAttention (MHSA + relative-position bias): masked_win_attention.py:49-131
  * WinBasedAttention (Swin block, alpha-masked, shifted): :134-251
  * Win_noShift_Attention gate (trunk * sigmoid(attention branch) + residual):
    Masked_Attention.py:143-189; unmasked twin in Attention.py:142-186.
  * SimplifiedAttention / ResBlock (mask codec): AutoEncoderMask_Journal.py:96-136.

Fixed-shape TPU formulation: all windows are computed densely and outputs of
alpha-empty windows are multiplied by 0 (see ops/window.py docstring for the
equivalence argument). QK^T / softmax / PV run with fp32 accumulation on the
MXU; batched over (windows x heads) so the matmuls stay large.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY
from .conv import Conv
from .window import (
    relative_position_index,
    swin_attention_bias,
    window_alive,
    window_partition,
    window_reverse,
)


class WindowAttention(nn.Module):
    """W-MSA over (nWB, N, C) token windows with relative-position bias."""

    dim: int
    window_size: int
    num_heads: int = 8
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, bias=None):
        nwb, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5
        dtype = self.policy.compute_dtype

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, nh),
            self.policy.param_dtype,
        )
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv",
                       param_dtype=self.policy.param_dtype, dtype=dtype,
                       precision=self.policy.precision)(x)
        qkv = qkv.reshape(nwb, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (nWB, nh, N, hd)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32,
                          precision=self.policy.precision)
        rel_idx = relative_position_index(self.window_size)
        rel_bias = table[rel_idx.reshape(-1)].reshape(n, n, nh)
        attn = attn + rel_bias.transpose(2, 0, 1)[None].astype(jnp.float32)
        if bias is not None:
            # bias: (nW, N, N) per-window additive mask, tiled over batch
            nw = bias.shape[0]
            attn = attn.reshape(nwb // nw, nw, nh, n, n) + \
                bias[None, :, None].astype(jnp.float32)
            attn = attn.reshape(nwb, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32,
                         precision=self.policy.precision).astype(dtype)
        out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
        return nn.Dense(c, use_bias=True, name="proj",
                        param_dtype=self.policy.param_dtype, dtype=dtype,
                        precision=self.policy.precision)(out)


class MaskedWinBlock(nn.Module):
    """Swin block gated by a per-pixel alpha (WinBasedAttention, :134-251).

    x: (B, H, W, C); alpha: (B, H, W, 1) downsampled mask at this scale.
    Alpha rolls together with x under the cyclic shift (:177-182); windows
    whose (shifted) alpha sums to zero output exactly 0 (:224,235-237);
    residual adds the unshifted input back (:249).
    """

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, alpha=None):
        """alpha=None gives the unmasked Swin twin (win_attention.py:118-214,
        wrapped by the unmasked Win_noShift_Attention in Attention.py:142)."""
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        shortcut = x

        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            if alpha is not None:
                alpha = jnp.roll(alpha, shift=(-ss, -ss), axis=(1, 2))

        x_win = window_partition(x, ws)                 # (B*nW, ws, ws, C)

        bias = swin_attention_bias(h, w, ws, ss) if ss > 0 else None
        tokens = x_win.reshape(-1, ws * ws, c)
        attn = WindowAttention(self.dim, ws, self.num_heads,
                               policy=self.policy, name="attn")(tokens, bias)
        if alpha is not None:
            a_win = window_partition(alpha, ws)         # (B*nW, ws, ws, 1)
            alive = window_alive(a_win)                 # (B*nW,)
            attn = attn * alive[:, None, None].astype(attn.dtype)
        out = window_reverse(attn.reshape(-1, ws, ws, c), ws, h, w)

        if ss > 0:
            out = jnp.roll(out, shift=(ss, ss), axis=(1, 2))
        return shortcut + out


class ResidualUnit(nn.Module):
    """conv1x1(N->N/2) GELU conv3x3 GELU conv1x1(N/2->N) + skip, then GELU
    (Masked_Attention.py:150-169)."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        n = self.dim
        y = Conv(n // 2, kernel_size=1, stride=1, policy=self.policy,
                 name="conv0")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = Conv(n // 2, kernel_size=3, stride=1, policy=self.policy,
                 name="conv1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = Conv(n, kernel_size=1, stride=1, policy=self.policy,
                 name="conv2")(y)
        return jax.nn.gelu(x + y, approximate=False)


class WinGateAttention(nn.Module):
    """Win_noShift_Attention (Masked_Attention.py:143-189).

    out = conv_a(x) * sigmoid(conv_b(masked_win_attn(x, alpha))) + x
    """

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, alpha=None):
        a = x
        for i in range(3):
            a = ResidualUnit(self.dim, policy=self.policy, name=f"conv_a{i}")(a)
        b = MaskedWinBlock(self.dim, self.num_heads, self.window_size,
                           self.shift_size, policy=self.policy, name="attn")(x, alpha)
        for i in range(3):
            b = ResidualUnit(self.dim, policy=self.policy, name=f"conv_b{i}")(b)
        b = Conv(self.dim, kernel_size=1, stride=1, policy=self.policy,
                 name="conv_b3")(b)
        return x + a * jax.nn.sigmoid(b)


class ResBlock(nn.Module):
    """Bottleneck residual block (AutoEncoderMask_Journal.py:96-110)."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        n = self.dim
        y = Conv(n // 2, kernel_size=1, stride=1, policy=self.policy,
                 name="conv1")(x)
        y = jax.nn.relu(y)
        y = Conv(n // 2, kernel_size=3, stride=1, policy=self.policy,
                 name="conv2")(y)
        y = jax.nn.relu(y)
        y = Conv(n, kernel_size=1, stride=1, policy=self.policy,
                 name="conv3")(y)
        return x + y


class SimplifiedAttention(nn.Module):
    """Convolutional attention gate of the mask codec
    (AutoEncoderMask_Journal.py:112-136): x + sigmoid(attn branch) * trunk."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        t = x
        for i in range(1, 4):
            t = ResBlock(self.dim, policy=self.policy,
                         name=f"trunk_ResBlock{i}")(t)
        a = x
        for i in range(1, 4):
            a = ResBlock(self.dim, policy=self.policy,
                         name=f"attention_ResBlock{i}")(a)
        a = Conv(self.dim, kernel_size=1, stride=1, policy=self.policy,
                 name="conv1")(a)
        return x + jax.nn.sigmoid(a) * t
