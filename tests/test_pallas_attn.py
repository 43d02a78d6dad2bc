"""Fused Pallas window attention vs the XLA formulation (interpret mode on
CPU; the real kernel is exercised on TPU by tools/profile_components.py and
bench.py with SERVE_POLICY)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.core.precision import DEFAULT_POLICY, Policy
from rgba_tpu.ops.attention import MaskedWinBlock

FUSED_F32 = Policy(fused_win_attn=True)


def _compare(shift, alpha_pattern):
    dim, ws, b, h, w = 16, 8, 2, 16, 16
    plain = MaskedWinBlock(dim=dim, num_heads=4, window_size=ws,
                           shift_size=shift, policy=DEFAULT_POLICY)
    fused = MaskedWinBlock(dim=dim, num_heads=4, window_size=ws,
                           shift_size=shift, policy=FUSED_F32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, dim))
    alpha = alpha_pattern(b, h, w)
    params = plain.init(key, x, alpha)
    o_plain = plain.apply(params, x, alpha)
    o_fused = fused.apply(params, x, alpha)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_plain),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_plain_unshifted():
    _compare(0, lambda b, h, w: jnp.ones((b, h, w, 1)))


def test_fused_matches_plain_shifted():
    _compare(4, lambda b, h, w: jnp.ones((b, h, w, 1)))


def test_fused_matches_plain_masked():
    def pattern(b, h, w):
        a = jnp.ones((b, h, w, 1))
        return a.at[:, :8, :8, :].set(0.0)
    _compare(0, pattern)
    _compare(4, pattern)


def test_fused_matches_plain_alpha_none():
    dim, ws = 16, 8
    plain = MaskedWinBlock(dim=dim, num_heads=4, window_size=ws,
                           shift_size=4, policy=DEFAULT_POLICY)
    fused = MaskedWinBlock(dim=dim, num_heads=4, window_size=ws,
                           shift_size=4, policy=FUSED_F32)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 16, 16, dim))
    params = plain.init(key, x, None)
    np.testing.assert_allclose(np.asarray(fused.apply(params, x, None)),
                               np.asarray(plain.apply(params, x, None)),
                               rtol=2e-5, atol=2e-5)
