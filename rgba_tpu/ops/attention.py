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
            # Pallas kernel path: fused qkv/scores/softmax/PV/proj/
            # alive-gating in one VMEM-resident pass.  Trainable via the
            # remat-VJP wrapper (backward = jax.vjp of the dense
            # formulation below, recomputed from the saved inputs).
            from .pallas.remat_vjp import fused_primal_xla_grad
            from .pallas.win_attn import fused_window_attention
            region, alive = fused
            region = jax.lax.stop_gradient(region)
            alive = jax.lax.stop_gradient(alive)
            rel_bias = table[rel_idx.reshape(-1)].reshape(n, n, nh)
            rel_bias = rel_bias.transpose(2, 0, 1).astype(jnp.float32)
            interpret = jax.default_backend() != "tpu"
            # group windows so each program sees ~1024 token rows (VMEM
            # budget at N=64 is the binding constraint; small windows can
            # batch more)
            wg = max(16, 1024 // n)

            def xla_equiv(xx, wq, bq, wp, bp, rb):
                """Dense formulation of the fused kernel's semantics:
                region-id additive mask + alive output gate."""
                qkv_ = jnp.einsum("wnc,cd->wnd", xx, wq.astype(dtype),
                                  precision=self.policy.precision) + \
                    bq.astype(dtype)
                q_ = qkv_[..., :c].reshape(nwb, n, nh, hd)
                k_ = qkv_[..., c:2 * c].reshape(nwb, n, nh, hd)
                v_ = qkv_[..., 2 * c:].reshape(nwb, n, nh, hd)
                sdt = jnp.float32 if dtype == jnp.float32 else dtype
                s = jnp.einsum("wnhd,wmhd->whnm", q_ * scale, k_,
                               preferred_element_type=sdt,
                               precision=self.policy.precision)
                s = s + rb[None].astype(sdt)
                same = region[:, None, :] == region[:, :, None]
                s = s + jnp.where(same, 0.0, -100.0)[:, None].astype(sdt)
                p_ = jax.nn.softmax(s.astype(jnp.float32),
                                    axis=-1).astype(dtype)
                o = jnp.einsum("whnm,wmhd->wnhd", p_, v_,
                               preferred_element_type=sdt,
                               precision=self.policy.precision)
                o = o.astype(dtype).reshape(nwb, n, c)
                o = jnp.einsum("wnc,cd->wnd", o, wp.astype(dtype),
                               precision=self.policy.precision) + \
                    bp.astype(dtype)
                return o * alive[:, :, None].astype(dtype)

            return fused_primal_xla_grad(
                lambda xx, wq, bq, wp, bp, rb: fused_window_attention(
                    xx, region, alive, wq.astype(dtype),
                    bq.astype(jnp.float32), wp.astype(dtype),
                    bp.astype(jnp.float32), rb, num_heads=nh,
                    window_group=wg, interpret=interpret),
                xla_equiv,
                (x.astype(dtype), wqkv, bqkv, wproj, bproj, rel_bias))

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


class _ConvP(nn.Module):
    """Param-only conv declaration: same tree path, shape and initializer
    as the Conv module (ops/conv.py), so checkpoints and the torch
    importer are unaffected — but the parent can hand the raw matrices to
    a fused Pallas kernel."""

    k: int
    cin: int
    cout: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.k, self.k, self.cin, self.cout), self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.cout,),
                          self.policy.param_dtype)
        return {"kernel": kernel, "bias": bias}


def _conv_apply(x, p, policy, pad):
    """Same math as the Conv module (stride 1)."""
    from .quant import policy_conv
    y = policy_conv(x, p["kernel"], policy, padding=((pad, pad), (pad, pad)))
    return y + p["bias"].astype(policy.compute_dtype)


def gate_chain_xla(x, g, params, *, act, post_act, trunk_names, gate_names,
                   block_keys, final_name, policy):
    """Plain XLA formulation of the fused gate chain (pure function of the
    params dict) — the rematerialized backward of ops/pallas/gate_chain.py
    and its numerical reference.  Math: Masked_Attention.py:143-189 /
    AutoEncoderMask_Journal.py:112-136."""
    def act_fn(v):
        if act == "relu":
            return jax.nn.relu(v)
        return jax.nn.gelu(v, approximate=(act == "gelu_tanh"))

    def chain(t, names):
        for nm in names:
            p = params[nm]
            y = act_fn(_conv_apply(t, p[block_keys[0]], policy, 0))
            y = act_fn(_conv_apply(y, p[block_keys[1]], policy, 1))
            y = _conv_apply(y, p[block_keys[2]], policy, 0)
            out = t + y
            t = act_fn(out) if post_act else out
        return t

    trunk = chain(x, trunk_names)
    gate = chain(x if g is None else g, gate_names)
    fin = _conv_apply(gate, params[final_name], policy, 0)
    return x + trunk * jax.nn.sigmoid(fin)


class ResidualUnit(nn.Module):
    """conv1x1(N->N/2) GELU conv3x3 GELU conv1x1(N/2->N) + skip, then GELU
    (Masked_Attention.py:150-169)."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        n = self.dim
        self.conv0 = _ConvP(1, n, n // 2, policy=self.policy)
        self.conv1 = _ConvP(3, n // 2, n // 2, policy=self.policy)
        self.conv2 = _ConvP(1, n // 2, n, policy=self.policy)

    def param_dict(self):
        return {"conv0": self.conv0(), "conv1": self.conv1(),
                "conv2": self.conv2()}

    def __call__(self, x):
        p = self.param_dict()
        y = _conv_apply(x, p["conv0"], self.policy, 0)
        y = self.policy.gelu(y)
        y = _conv_apply(y, p["conv1"], self.policy, 1)
        y = self.policy.gelu(y)
        y = _conv_apply(y, p["conv2"], self.policy, 0)
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

    def setup(self):
        # attribute names ARE the param-tree names (flax setup rule) —
        # they must stay conv_a0/…/conv_b3 for checkpoint compatibility
        self.conv_a0 = ResidualUnit(self.dim, policy=self.policy)
        self.conv_a1 = ResidualUnit(self.dim, policy=self.policy)
        self.conv_a2 = ResidualUnit(self.dim, policy=self.policy)
        self.attn = MaskedWinBlock(self.dim, self.num_heads,
                                   self.window_size, self.shift_size,
                                   policy=self.policy)
        self.conv_b0 = ResidualUnit(self.dim, policy=self.policy)
        self.conv_b1 = ResidualUnit(self.dim, policy=self.policy)
        self.conv_b2 = ResidualUnit(self.dim, policy=self.policy)
        self.conv_b3 = _ConvP(1, self.dim, self.dim, policy=self.policy)

    def __call__(self, x, alpha=None):
        a_units = (self.conv_a0, self.conv_a1, self.conv_a2)
        b_units = (self.conv_b0, self.conv_b1, self.conv_b2)
        b = self.attn(x, alpha)

        if self.policy.fused_gate_chain:
            from .pallas.gate_chain import fused_gate_chain, gate_chain_tiles
            from .pallas.remat_vjp import fused_primal_xla_grad
            if all(gate_chain_tiles(x.shape[1], x.shape[2], x.shape[3])):
                params = {f"conv_a{i}": a_units[i].param_dict()
                          for i in range(3)}
                params.update({f"conv_b{i}": b_units[i].param_dict()
                               for i in range(3)})
                params["conv_b3"] = self.conv_b3()
                dt = self.policy.compute_dtype
                kw = dict(act=self.policy.gelu_kind, post_act=True,
                          trunk_names=("conv_a0", "conv_a1", "conv_a2"),
                          gate_names=("conv_b0", "conv_b1", "conv_b2"),
                          block_keys=("conv0", "conv1", "conv2"),
                          final_name="conv_b3")
                return fused_primal_xla_grad(
                    lambda xx, bb, pp: fused_gate_chain(
                        xx, bb, pp,
                        interpret=jax.default_backend() != "tpu", **kw),
                    lambda xx, bb, pp: gate_chain_xla(
                        xx, bb, pp, policy=self.policy, **kw),
                    (x.astype(dt), b.astype(dt), params))

        a = x
        for u in a_units:
            a = u(a)
        for u in b_units:
            b = u(b)
        b = _conv_apply(b, self.conv_b3(), self.policy, 0)
        return x + a * jax.nn.sigmoid(b)


class ResBlock(nn.Module):
    """Bottleneck residual block (AutoEncoderMask_Journal.py:96-110)."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        n = self.dim
        self.conv1 = _ConvP(1, n, n // 2, policy=self.policy)
        self.conv2 = _ConvP(3, n // 2, n // 2, policy=self.policy)
        self.conv3 = _ConvP(1, n // 2, n, policy=self.policy)

    def param_dict(self):
        return {"conv1": self.conv1(), "conv2": self.conv2(),
                "conv3": self.conv3()}

    def __call__(self, x):
        p = self.param_dict()
        y = jax.nn.relu(_conv_apply(x, p["conv1"], self.policy, 0))
        y = jax.nn.relu(_conv_apply(y, p["conv2"], self.policy, 1))
        y = _conv_apply(y, p["conv3"], self.policy, 0)
        return x + y


class SimplifiedAttention(nn.Module):
    """Convolutional attention gate of the mask codec
    (AutoEncoderMask_Journal.py:112-136): x + sigmoid(attn branch) * trunk."""

    dim: int
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.trunk_ResBlock1 = ResBlock(self.dim, policy=self.policy)
        self.trunk_ResBlock2 = ResBlock(self.dim, policy=self.policy)
        self.trunk_ResBlock3 = ResBlock(self.dim, policy=self.policy)
        self.attention_ResBlock1 = ResBlock(self.dim, policy=self.policy)
        self.attention_ResBlock2 = ResBlock(self.dim, policy=self.policy)
        self.attention_ResBlock3 = ResBlock(self.dim, policy=self.policy)
        self.conv1 = _ConvP(1, self.dim, self.dim, policy=self.policy)

    def __call__(self, x):
        trunk = (self.trunk_ResBlock1, self.trunk_ResBlock2,
                 self.trunk_ResBlock3)
        att = (self.attention_ResBlock1, self.attention_ResBlock2,
               self.attention_ResBlock3)

        if self.policy.fused_gate_chain:
            from .pallas.gate_chain import fused_gate_chain, gate_chain_tiles
            from .pallas.remat_vjp import fused_primal_xla_grad
            if all(gate_chain_tiles(x.shape[1], x.shape[2], x.shape[3])):
                params = {f"trunk_ResBlock{i + 1}": trunk[i].param_dict()
                          for i in range(3)}
                params.update({
                    f"attention_ResBlock{i + 1}": att[i].param_dict()
                    for i in range(3)})
                params["conv1"] = self.conv1()
                kw = dict(act="relu", post_act=False,
                          trunk_names=("trunk_ResBlock1", "trunk_ResBlock2",
                                       "trunk_ResBlock3"),
                          gate_names=("attention_ResBlock1",
                                      "attention_ResBlock2",
                                      "attention_ResBlock3"),
                          block_keys=("conv1", "conv2", "conv3"),
                          final_name="conv1")
                return fused_primal_xla_grad(
                    lambda xx, pp: fused_gate_chain(
                        xx, None, pp,
                        interpret=jax.default_backend() != "tpu", **kw),
                    lambda xx, pp: gate_chain_xla(
                        xx, None, pp, policy=self.policy, **kw),
                    (x.astype(self.policy.compute_dtype), params))

        t = x
        for u in trunk:
            t = u(t)
        a = x
        for u in att:
            a = u(a)
        a = _conv_apply(a, self.conv1(), self.policy, 0)
        return x + jax.nn.sigmoid(a) * t
