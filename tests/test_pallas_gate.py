"""Fused Pallas gate-chain kernel vs the XLA module paths (interpret mode).

Covers both users: WinGateAttention's ResidualUnit chains
(Masked_Attention.py:143-189) and SimplifiedAttention's ResBlock chains
(AutoEncoderMask_Journal.py:112-136)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.core.precision import DEFAULT_POLICY, Policy
from rgba_tpu.ops.attention import SimplifiedAttention, WinGateAttention

FUSED_F32 = Policy(fused_gate_chain=True)


@pytest.mark.parametrize("dim,hw", [(64, (32, 64)), (32, (64, 64))])
def test_fused_simplified_attention_matches_plain(dim, hw):
    plain = SimplifiedAttention(dim, policy=DEFAULT_POLICY)
    fused = SimplifiedAttention(dim, policy=FUSED_F32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, hw[0], hw[1], dim))
    params = plain.init(key, x)
    o_plain = plain.apply(params, x)
    o_fused = fused.apply(params, x)
    assert o_fused.shape == x.shape
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_plain),
                               rtol=2e-5, atol=2e-5)


def test_fused_win_gate_matches_plain():
    """Multi-tile geometry (64x128 at th=32/tw=64) exercises the border
    masking between tiles; masked attention exercises the separate
    gate-chain input."""
    dim, ws, ss = 32, 8, 4
    plain = WinGateAttention(dim, num_heads=4, window_size=ws, shift_size=ss,
                             policy=DEFAULT_POLICY)
    fused = WinGateAttention(dim, num_heads=4, window_size=ws, shift_size=ss,
                             policy=FUSED_F32)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 64, 128, dim))
    alpha = (jax.random.uniform(key, (1, 64, 128, 1)) > 0.4).astype(
        jnp.float32)
    params = plain.init(key, x, alpha)
    o_plain = plain.apply(params, x, alpha)
    o_fused = fused.apply(params, x, alpha)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_plain),
                               rtol=2e-5, atol=2e-5)


def test_gate_param_paths_unchanged():
    """Checkpoint/torch-importer compatibility: the explicit-param refactor
    must keep conv_a{i}/conv{j}, conv_b3, trunk_ResBlock{i}/conv{j} paths
    and Conv-identical shapes."""
    m = WinGateAttention(64, num_heads=4)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 64)))["params"]
    assert {"conv_a0", "conv_a1", "conv_a2", "conv_b0", "conv_b1", "conv_b2",
            "conv_b3", "attn"} <= set(p.keys())
    assert p["conv_a0"]["conv1"]["kernel"].shape == (3, 3, 32, 32)
    assert p["conv_b3"]["kernel"].shape == (1, 1, 64, 64)

    s = SimplifiedAttention(64)
    ps = s.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 64)))["params"]
    assert {"trunk_ResBlock1", "attention_ResBlock3", "conv1"} <= set(ps.keys())
    assert ps["trunk_ResBlock1"]["conv2"]["kernel"].shape == (3, 3, 32, 32)


def test_gate_chain_tiles_channel_aware():
    """Wide-channel layers must take half-height tiles (VMEM: 24.8 MB
    measured at (32,64)xC=192 vs the 16 MB v5e budget)."""
    from rgba_tpu.ops.pallas.gate_chain import gate_chain_tiles
    assert gate_chain_tiles(128, 192, 192) == (16, 64)
    assert gate_chain_tiles(64, 96, 80) == (32, 32)
    assert gate_chain_tiles(30, 30, 64) == (0, 0)
