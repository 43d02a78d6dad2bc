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
    swin_region_ids,
    window_alive,
    window_partition,
    window_reverse,
)


class WindowAttention(nn.Module):
    """W-MSA over (nWB, N, C) token windows with relative-position bias.

    Parameters are explicit matrices (qkv_kernel/qkv_bias/proj_kernel/
    proj_bias) so the fused Pallas path can consume them directly; the
    torch importer maps attn.attn.qkv.weight et al. onto them.
    """

    dim: int
    window_size: int
    num_heads: int = 8
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, bias=None, fused=None):
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
        wqkv = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                          (c, 3 * c), self.policy.param_dtype)
        bqkv = self.param("qkv_bias", nn.initializers.zeros, (3 * c,),
                          self.policy.param_dtype)
        wproj = self.param("proj_kernel", nn.initializers.lecun_normal(),
                           (c, c), self.policy.param_dtype)
        bproj = self.param("proj_bias", nn.initializers.zeros, (c,),
                           self.policy.param_dtype)

        rel_idx = relative_position_index(self.window_size)

        if fused is not None:
            # Pallas kernel path (inference): fused qkv/scores/softmax/PV/
            # proj/alive-gating in one VMEM-resident pass.
            from .pallas.win_attn import fused_window_attention
            region, alive = fused
            rel_bias = table[rel_idx.reshape(-1)].reshape(n, n, nh)
            rel_bias = rel_bias.transpose(2, 0, 1).astype(jnp.float32)
            interpret = jax.default_backend() != "tpu"
            # group windows so each program sees ~1024 token rows (VMEM
            # budget at N=64 is the binding constraint; small windows can
            # batch more)
            wg = max(16, 1024 // n)
            return fused_window_attention(
                x.astype(dtype), region, alive,
                wqkv.astype(dtype), bqkv.astype(jnp.float32),
                wproj.astype(dtype), bproj.astype(jnp.float32),
                rel_bias, num_heads=nh, window_group=wg,
                interpret=interpret)

        qkv = jnp.einsum("wnc,cd->wnd", x.astype(dtype), wqkv.astype(dtype),
                         precision=self.policy.precision) + bqkv.astype(dtype)
        # heads stay in trailing dims (no 5-D transpose; einsum handles the
        # head batching) — verified numerically identical to the
        # transpose-based layout, measurably faster on TPU
        q = qkv[..., :c].reshape(nwb, n, nh, hd)
        k = qkv[..., c:2 * c].reshape(nwb, n, nh, hd)
        v = qkv[..., 2 * c:].reshape(nwb, n, nh, hd)

        # fp32 parity mode accumulates scores in fp32 on the MXU; bf16 speed
        # mode keeps scores bf16 (softmax itself still reduces in fp32)
        score_dtype = jnp.float32 if dtype == jnp.float32 else dtype
        attn = jnp.einsum("wnhd,wmhd->whnm", q * scale, k,
                          preferred_element_type=score_dtype,
                          precision=self.policy.precision)
        rel_bias = table[rel_idx.reshape(-1)].reshape(n, n, nh)
        attn = attn + rel_bias.transpose(2, 0, 1)[None].astype(score_dtype)
        if bias is not None:
            # bias: (nW, N, N) per-window additive mask, tiled over batch
            nw = bias.shape[0]
            attn = attn.reshape(nwb // nw, nw, nh, n, n) + \
                bias[None, :, None].astype(score_dtype)
            attn = attn.reshape(nwb, nh, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
        out = jnp.einsum("whnm,wmhd->wnhd", attn, v,
                         preferred_element_type=score_dtype,
                         precision=self.policy.precision).astype(dtype)
        out = out.reshape(nwb, n, c)
        return jnp.einsum("wnc,cd->wnd", out, wproj.astype(dtype),
                          precision=self.policy.precision) + bproj.astype(dtype)


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
        tokens = x_win.reshape(-1, ws * ws, c)
        nwb = tokens.shape[0]

        if alpha is not None:
            a_win = window_partition(alpha, ws)         # (B*nW, ws, ws, 1)
            alive = window_alive(a_win)                 # (B*nW,)
        else:
            alive = None

        wa = WindowAttention(self.dim, ws, self.num_heads,
                             policy=self.policy, name="attn")
        # measured faster than XLA at both window sizes (8x8: 3.9 vs 4.7 ms,
        # 4x4/C=80: 4.0 vs 6.6 ms per batch-16 at model shapes on v5e)
        if self.policy.fused_win_attn:
            region = swin_region_ids(h, w, ws, ss)      # (nW_spatial, N)
            region = jnp.tile(region, (b, 1))
            gate = (alive if alive is not None
                    else jnp.ones((nwb,), self.policy.compute_dtype))
            attn = wa(tokens, fused=(region, gate[:, None]))
        else:
            bias = swin_attention_bias(h, w, ws, ss) if ss > 0 else None
            attn = wa(tokens, bias)
            if alive is not None:
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
        y = self.policy.gelu(y)
        y = Conv(n // 2, kernel_size=3, stride=1, policy=self.policy,
                 name="conv1")(y)
        y = self.policy.gelu(y)
        y = Conv(n, kernel_size=1, stride=1, policy=self.policy,
                 name="conv2")(y)
        return self.policy.gelu(x + y)


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
