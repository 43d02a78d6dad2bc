import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.entropy.bottleneck import EntropyBottleneck
from rgba_tpu.entropy.cdf import pmf_to_quantized_cdf_py
from rgba_tpu.entropy.gaussian import GaussianConditional, get_scale_table
from rgba_tpu.entropy.rate import rate_bits


# ---------------------------------------------------------------- cdf


def test_cdf_basic_properties():
    pmf = np.array([0.2, 0.5, 0.25, 0.05])
    cdf = pmf_to_quantized_cdf_py(pmf, 16)
    assert cdf[0] == 0 and cdf[-1] == 1 << 16
    assert (np.diff(cdf) > 0).all()
    freqs = np.diff(cdf).astype(np.float64) / (1 << 16)
    np.testing.assert_allclose(freqs, pmf, atol=2e-4)


def test_cdf_zero_prob_symbols_get_mass():
    pmf = np.array([0.5, 0.0, 0.5, 0.0])
    cdf = pmf_to_quantized_cdf_py(pmf, 16)
    assert (np.diff(cdf) >= 1).all()


def test_cdf_tiny_tail():
    pmf = np.array([1.0, 1e-12])
    cdf = pmf_to_quantized_cdf_py(pmf, 16)
    assert (np.diff(cdf) >= 1).all() and cdf[-1] == 1 << 16


# --------------------------------------------------------- gaussian


def test_gaussian_eval_likelihood_formula():
    gc = GaussianConditional()
    y = jnp.array([[1.2, -0.4, 3.0]])
    means = jnp.array([[1.0, 0.0, 0.0]])
    scales = jnp.array([[0.5, 1.0, 2.0]])
    lik = np.asarray(gc.likelihood(y, scales, means, training=False))

    def bin_mass(v, s):
        # mass of N(0, s^2) in [v-0.5, v+0.5]
        def cdf(x):
            return 0.5 * math.erfc(-x / math.sqrt(2))
        return cdf((v + 0.5) / s) - cdf((v - 0.5) / s)

    expect = [bin_mass(round(1.2 - 1.0), 0.5),
              bin_mass(round(-0.4), 1.0),
              bin_mass(round(3.0), 2.0)]
    np.testing.assert_allclose(lik[0], expect, rtol=1e-5)


def test_gaussian_scale_lower_bound():
    gc = GaussianConditional()
    y = jnp.zeros((1, 1))
    means = jnp.zeros((1, 1))
    tiny = jnp.full((1, 1), 1e-6)
    ref = jnp.full((1, 1), 0.11)
    np.testing.assert_allclose(
        gc.likelihood(y, tiny, means), gc.likelihood(y, ref, means), rtol=1e-6)


def test_gaussian_training_noise_changes_likelihood():
    gc = GaussianConditional()
    y = jnp.ones((4, 4)) * 0.3
    s = jnp.ones((4, 4))
    m = jnp.zeros((4, 4))
    l1 = gc.likelihood(y, s, m, training=True, rng=jax.random.PRNGKey(0))
    l2 = gc.likelihood(y, s, m, training=True, rng=jax.random.PRNGKey(1))
    assert not np.allclose(l1, l2)


def test_gaussian_build_indexes_matches_naive():
    table = get_scale_table()
    gc = GaussianConditional(table)
    scales = jnp.asarray(
        np.random.RandomState(0).uniform(0.05, 300, (2, 3, 5)).astype(np.float32))
    idx = np.asarray(gc.build_indexes(scales))
    s = np.maximum(np.asarray(scales), 0.11)
    naive = np.full(s.shape, len(table) - 1, np.int64)
    for t in table[:-1]:
        naive -= (s <= t)
    np.testing.assert_array_equal(idx, naive)


def test_gaussian_update_tables():
    table = get_scale_table()
    gc = GaussianConditional(table)
    gc.update()
    assert gc.quantized_cdfs.shape[0] == len(table)
    # every row a valid cdf
    for r in range(len(table)):
        ln = gc.cdf_lengths[r]
        row = gc.quantized_cdfs[r, :ln]
        assert row[0] == 0 and row[-1] == 1 << 16
        assert (np.diff(row) > 0).all()
    # small scale -> few symbols; big scale -> many
    assert gc.cdf_lengths[0] < gc.cdf_lengths[-1]
    # offsets symmetric around 0
    assert (gc.offsets <= 0).all()


# ------------------------------------------------------ bottleneck


@pytest.fixture(scope="module")
def eb_params():
    eb = EntropyBottleneck(channels=4)
    z = jnp.zeros((1, 2, 2, 4))
    params = eb.init({"params": jax.random.PRNGKey(0),
                      "noise": jax.random.PRNGKey(1)}, z, training=True)
    return eb, params


def test_bottleneck_likelihood_is_valid_pmf(eb_params):
    eb, params = eb_params
    # integrate the bin masses over a wide integer range: should sum ~1
    grid = jnp.arange(-100, 101, dtype=jnp.float32)
    z = jnp.tile(grid.reshape(1, -1, 1, 1), (1, 1, 1, 4))
    _, lik = eb.apply(params, z, training=False)
    total = np.asarray(jnp.sum(lik, axis=(0, 1, 2)))
    np.testing.assert_allclose(total, 1.0, atol=1e-2)
    assert (np.asarray(lik) > 0).all() and (np.asarray(lik) <= 1).all()


def test_bottleneck_training_noise(eb_params):
    eb, params = eb_params
    z = jnp.zeros((2, 4, 4, 4))
    _, l1 = eb.apply(params, z, training=True,
                     rngs={"noise": jax.random.PRNGKey(0)})
    _, l2 = eb.apply(params, z, training=True,
                     rngs={"noise": jax.random.PRNGKey(5)})
    assert not np.allclose(l1, l2)
    assert (np.asarray(l1) > 0).all()


def test_bottleneck_ste_offsets(eb_params):
    eb, params = eb_params
    z = jnp.full((1, 1, 1, 4), 0.4)
    z_hat, _ = eb.apply(params, z, training=False)
    med = np.asarray(eb.apply(params, method=lambda m: m.medians()))
    np.testing.assert_allclose(
        np.asarray(z_hat)[0, 0, 0], np.round(0.4 - med) + med, rtol=1e-6)


def test_bottleneck_aux_loss_decreases(eb_params):
    eb, params = eb_params

    def loss(p):
        return eb.apply(p, method=lambda m: m.aux_loss())

    l0 = loss(params)
    g = jax.grad(lambda p: loss(p))(params)
    # gradient only on quantiles
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in flat:
        name = "/".join(str(p) for p in path)
        if "quantiles" not in name:
            assert np.allclose(leaf, 0.0), name
    p2 = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, params, g)
    assert loss(p2) < l0


def test_bottleneck_cdf_tables(eb_params):
    eb, params = eb_params
    tables = eb.cdf_tables(params["params"])
    assert tables["quantized_cdfs"].shape[0] == 4
    for r in range(4):
        ln = tables["cdf_lengths"][r]
        row = tables["quantized_cdfs"][r, :ln]
        assert row[0] == 0 and row[-1] == 1 << 16
        assert (np.diff(row) > 0).all()


def test_rate_bits_clamp():
    lik = jnp.array([1.0, 0.5, 0.0, 2.0])
    bits = float(rate_bits(lik))
    # 0 + 1 + (-log2(1e-10) = 33.22, the 1e-10 floor binds before the 50
    # clamp) + 0 (negative bits clamp to 0 for lik > 1)
    expect = 0.0 + 1.0 + (-math.log(1e-10, 2)) + 0.0
    assert abs(bits - expect) < 0.01
