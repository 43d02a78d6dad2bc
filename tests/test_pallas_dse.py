"""Fused Pallas DSE vs the XLA chain (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.core.precision import DEFAULT_POLICY, Policy
from rgba_tpu.ops.enhance import DSE

FUSED_F32 = Policy(fused_dse=True)


@pytest.mark.parametrize("cio,leaky", [(3, False), (1, True)])
def test_fused_dse_matches_plain(cio, leaky):
    plain = DSE(in_ch=cio, leaky=leaky, policy=DEFAULT_POLICY)
    fused = DSE(in_ch=cio, leaky=leaky, policy=FUSED_F32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 128, 64, cio))
    params = plain.init(key, x)
    o_plain = plain.apply(params, x)
    o_fused = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_plain),
                               rtol=2e-5, atol=2e-5)


def test_fused_dse_param_paths_unchanged():
    """The importer mapping relies on input_conv/enh{k}/conv{j}/output_conv
    paths — verify the refactor kept them."""
    m = DSE(in_ch=3)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    assert set(params.keys()) == {"input_conv", "enh1", "enh2", "enh3",
                                  "output_conv"}
    assert params["enh1"]["conv1"]["kernel"].shape == (3, 3, 32, 32)
    assert params["input_conv"]["kernel"].shape == (1, 1, 3, 32)


def test_fused_dse_nondivisible_falls_back():
    """Sizes not divisible by the tile fall back to the XLA chain."""
    fused = DSE(in_ch=3, policy=FUSED_F32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 96, 96, 3))
    params = fused.init(jax.random.PRNGKey(0), x)
    out = fused.apply(params, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


PACKED_F32 = Policy(packed_dse=True)


@pytest.mark.parametrize("cio,leaky", [(3, False), (1, True)])
def test_packed_dse_matches_plain(cio, leaky):
    """The 4-image channel-packed block-diag relayout (the serving DSE
    path, 2.27x on v5e) is the same math as the plain chain."""
    plain = DSE(in_ch=cio, leaky=leaky, policy=DEFAULT_POLICY)
    packed = DSE(in_ch=cio, leaky=leaky, policy=PACKED_F32)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (8, 64, 64, cio))
    params = plain.init(key, x)
    o_plain = plain.apply(params, x)
    o_packed = packed.apply(params, x)
    np.testing.assert_allclose(np.asarray(o_packed), np.asarray(o_plain),
                               rtol=2e-5, atol=2e-5)


def test_packed_dse_nondivisible_batch_falls_back():
    """Batches not divisible by 4 take the plain chain (identical result)."""
    plain = DSE(in_ch=3, policy=DEFAULT_POLICY)
    packed = DSE(in_ch=3, policy=PACKED_F32)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (3, 64, 64, 3))
    params = plain.init(key, x)
    np.testing.assert_array_equal(np.asarray(packed.apply(params, x)),
                                  np.asarray(plain.apply(params, x)))


def test_packed_dse_grad():
    """Packed path is plain XLA — gradients must match the reference chain."""
    plain = DSE(in_ch=3, policy=DEFAULT_POLICY)
    packed = DSE(in_ch=3, policy=PACKED_F32)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, 32, 32, 3))
    params = plain.init(key, x)

    def loss(mod):
        return lambda p: jnp.sum(jnp.square(mod.apply(p, x)))

    g_plain = jax.grad(loss(plain))(params)
    g_packed = jax.grad(loss(packed))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_plain, g_packed)
