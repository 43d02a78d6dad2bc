import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec, reconstruct_error
from rgba_tpu.models.pipeline import RGBAPipeline
from rgba_tpu.ops.mask_pyramid import mask_pyramid

KEY = jax.random.PRNGKey(0)
H = W = 64


def _mask(b=1):
    m = jnp.zeros((b, H, W, 1))
    return m.at[:, 8:48, 16:56, :].set(1.0)


def test_reconstruct_error_normalization():
    x = jnp.ones((2, 4, 4, 3))
    x_hat = jnp.zeros((2, 4, 4, 3))
    mask = jnp.zeros((2, 4, 4, 1)).at[:, :2].set(1.0)   # half visible
    # per sample: sum err = 2*4*3 = 24 over count 24 -> 1.0
    np.testing.assert_allclose(reconstruct_error(x, x_hat, mask), 1.0)
    # all-masked sample: count clamps to 1, err 0
    np.testing.assert_allclose(
        reconstruct_error(x, x, jnp.zeros((2, 4, 4, 1))), 0.0)


@pytest.fixture(scope="module")
def mask_codec():
    model = MaskCodec()
    mask = _mask()
    params = model.init({"params": KEY, "noise": KEY}, mask, training=True)
    return model, params, mask


def test_mask_codec_forward(mask_codec):
    model, params, mask = mask_codec
    out = model.apply(params, mask, training=False)
    assert out["x_hat"].shape == mask.shape
    assert float(out["bpp"]) > 0
    assert np.isfinite(float(out["mse_loss"]))
    np.testing.assert_allclose(float(out["bpp"]),
                               float(out["bpp_y"] + out["bpp_z"]), rtol=1e-6)


def test_mask_codec_training_stochastic(mask_codec):
    model, params, mask = mask_codec
    o1 = model.apply(params, mask, training=True,
                     rngs={"noise": jax.random.PRNGKey(1)})
    o2 = model.apply(params, mask, training=True,
                     rngs={"noise": jax.random.PRNGKey(2)})
    assert float(o1["bpp"]) != float(o2["bpp"])


def test_mask_codec_grads(mask_codec):
    model, params, mask = mask_codec

    def loss(p):
        out = model.apply(p, mask, training=True,
                          rngs={"noise": jax.random.PRNGKey(0)})
        return 1024.0 * out["mse_loss"] + out["bpp"]

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the encoder conv gets signal
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert gnorm > 0


@pytest.fixture(scope="module")
def rgb_setup():
    model = RGBCodec()
    mask = _mask()
    x = jax.random.uniform(KEY, (1, H, W, 3)) * mask
    me = mask_pyramid(mask)
    params = model.init({"params": KEY, "noise": KEY},
                        x, mask, mask, me, training=True)
    return model, params, x, mask, me


def test_rgb_codec_forward(rgb_setup):
    model, params, x, mask, me = rgb_setup
    out = model.apply(params, x, mask, mask, me, training=False)
    assert out["x_hat"].shape == x.shape
    assert float(out["bpp"]) > 0
    assert np.isfinite(float(out["mse_loss"]))


def test_rgb_codec_grads(rgb_setup):
    model, params, x, mask, me = rgb_setup

    def loss(p):
        out = model.apply(p, x, mask, mask, me, training=True,
                          rngs={"noise": jax.random.PRNGKey(0)})
        return 4096.0 * out["mse_loss"] + out["bpp"]

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_pipeline_forward():
    model = RGBAPipeline()
    mask = _mask()
    x = jax.random.uniform(KEY, (1, H, W, 3)) * mask
    params = model.init({"params": KEY, "noise": KEY}, x, mask, training=False)
    out = model.apply(params, x, mask, training=False)
    assert out["x_hat"].shape == x.shape
    assert out["recon_mask"].shape == mask.shape
    # partially-transparent mask => mask bpp is included
    np.testing.assert_allclose(
        float(out["bpp"]), float(out["bpp_rgb"] + out["bpp_mask"]), rtol=1e-6)
    assert (np.asarray(out["x_hat"]) >= 0).all()
    assert (np.asarray(out["x_hat"]) <= 1).all()


def test_pipeline_opaque_mask_excludes_mask_bpp():
    model = RGBAPipeline()
    mask = jnp.ones((1, H, W, 1))
    x = jax.random.uniform(KEY, (1, H, W, 3))
    params = model.init({"params": KEY, "noise": KEY}, x, mask, training=False)
    out = model.apply(params, x, mask, training=False)
    np.testing.assert_allclose(float(out["bpp"]), float(out["bpp_rgb"]),
                               rtol=1e-6)
