import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.ops.gdn import GDN, _PEDESTAL


def _manual_gdn(x_nhwc, beta_raw, gamma_raw, inverse, beta_min=1e-6):
    """Direct numpy transcription of the GDN math (layers/GDN.py:64-94)."""
    beta_bound = (beta_min + _PEDESTAL) ** 0.5
    gamma_bound = _PEDESTAL ** 0.5
    beta = np.maximum(beta_raw, beta_bound) ** 2 - _PEDESTAL
    gamma = np.maximum(gamma_raw, gamma_bound) ** 2 - _PEDESTAL
    # torch conv2d(x^2, gamma.view(ch,ch,1,1), beta): out_i = sum_j g[i,j] x_j^2
    norm = np.einsum("bhwj,ij->bhwi", x_nhwc ** 2, gamma) + beta
    norm = np.sqrt(norm)
    return x_nhwc * norm if inverse else x_nhwc / norm


def test_gdn_forward_matches_formula():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 6, 4).astype(np.float32)
    m = GDN()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    beta = np.asarray(params["params"]["beta"])
    gamma = np.asarray(params["params"]["gamma"])
    out = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(out, _manual_gdn(x, beta, gamma, False),
                               rtol=1e-5, atol=1e-5)


def test_igdn_forward_matches_formula():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 4, 3).astype(np.float32)
    m = GDN(inverse=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    beta = np.asarray(params["params"]["beta"])
    gamma = np.asarray(params["params"]["gamma"])
    out = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(out, _manual_gdn(x, beta, gamma, True),
                               rtol=1e-5, atol=1e-5)


def test_gdn_init_is_identity_like():
    """At init, gamma = 0.1*I and beta = 1, so GDN(x) = x / sqrt(1 + 0.1 x^2)."""
    x = np.full((1, 2, 2, 3), 2.0, dtype=np.float32)
    m = GDN()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    expect = 2.0 / np.sqrt(1.0 + 0.1 * 4.0)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_gdn_grad_finite():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 3).astype(np.float32))
    m = GDN()
    params = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
