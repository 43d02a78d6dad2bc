"""Training through the fused Pallas kernels (remat-VJP wrapper).

The fused kernels run as the primal while gradients come from jax.vjp of
the plain XLA formulation, rematerialized from the inputs
(ops/pallas/remat_vjp.py).  These tests pin, in fp32 interpret mode, that
grads through a fused-policy module equal grads through the plain module
for every fused op: window attention, both gate chains, and DSE.

Reference analog: the torch modules autograd through eager ops
(Masked_Attention.py:150-169, TransformRGB.py:16-49); here the same
trainability is provided for the TPU-fused forward paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.core.precision import DEFAULT_POLICY, Policy
from rgba_tpu.ops.attention import (
    MaskedWinBlock,
    SimplifiedAttention,
    WinGateAttention,
)
from rgba_tpu.ops.enhance import DSE


def _grad_compare(plain, fused, params, args, rtol=2e-4, atol=2e-4):
    def loss(mod):
        def f(p, *a):
            out = mod.apply(p, *a)
            # nonlinear reduction so cotangents vary over positions
            return jnp.sum(out * jnp.sin(out))
        return f

    g_plain = jax.grad(loss(plain))(params, *args)
    g_fused = jax.grad(loss(fused))(params, *args)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    assert len(flat_p) == len(flat_f)
    for (path, gp), (_, gf) in zip(flat_p, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gp), rtol=rtol, atol=atol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
    # primal values must also agree (fused forward == xla forward in fp32)
    np.testing.assert_allclose(np.asarray(fused.apply(params, *args)),
                               np.asarray(plain.apply(params, *args)),
                               rtol=2e-5, atol=2e-5)


def test_grad_through_fused_win_attention():
    dim, ws = 16, 8
    plain = MaskedWinBlock(dim=dim, num_heads=4, window_size=ws,
                           shift_size=4, policy=DEFAULT_POLICY)
    fused = MaskedWinBlock(dim=dim, num_heads=4, window_size=ws,
                           shift_size=4, policy=Policy(fused_win_attn=True))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, dim))
    alpha = jnp.ones((2, 16, 16, 1)).at[:, :8, :8, :].set(0.0)
    params = plain.init(key, x, alpha)
    _grad_compare(plain, fused, params, (x, alpha))


def test_grad_through_fused_gate_chain_wingate():
    dim = 32
    plain = WinGateAttention(dim, num_heads=4, window_size=8, shift_size=4,
                             policy=DEFAULT_POLICY)
    fused = WinGateAttention(dim, num_heads=4, window_size=8, shift_size=4,
                             policy=Policy(fused_gate_chain=True))
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 32, 64, dim))
    alpha = (jax.random.uniform(key, (1, 32, 64, 1)) > 0.4).astype(
        jnp.float32)
    params = plain.init(key, x, alpha)
    _grad_compare(plain, fused, params, (x, alpha))


def test_grad_through_fused_simplified_attention():
    dim = 32
    plain = SimplifiedAttention(dim, policy=DEFAULT_POLICY)
    fused = SimplifiedAttention(dim, policy=Policy(fused_gate_chain=True))
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 32, 64, dim))
    params = plain.init(key, x)
    _grad_compare(plain, fused, params, (x,))


@pytest.mark.parametrize("cio,leaky", [(3, False), (1, True)])
def test_grad_through_fused_dse(cio, leaky):
    plain = DSE(in_ch=cio, leaky=leaky, policy=DEFAULT_POLICY)
    fused = DSE(in_ch=cio, leaky=leaky, policy=Policy(fused_dse=True))
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 64, 64, cio))
    params = plain.init(key, x)
    _grad_compare(plain, fused, params, (x,))


@pytest.mark.parametrize("inverse", [False, True])
def test_grad_through_fused_gdn(inverse):
    from rgba_tpu.ops.gdn import GDN
    plain = GDN(inverse=inverse, policy=DEFAULT_POLICY)
    fused = GDN(inverse=inverse, policy=Policy(fused_gdn=True))
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 16, 24, 32))
    params = plain.init(key, x)
    _grad_compare(plain, fused, params, (x,))
