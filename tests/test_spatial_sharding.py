"""Spatial (window-grid) sharding over a `space` mesh axis (SURVEY §5).

Windows are independent, convs need halo exchange, the cyclic shift is a
collective permute — all of which GSPMD inserts automatically when the
input is sharded over H. These tests pin that a spatially-sharded eval
forward is numerically identical to the unsharded one on a 2x4
(space x data) mesh of virtual devices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.ops.attention import WinGateAttention

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh2d():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("space", "data"))


def test_win_gate_spatially_sharded(mesh2d):
    """Masked window attention sharded over H: identical to unsharded."""
    m = WinGateAttention(dim=32, num_heads=4, window_size=8, shift_size=4)
    x = jax.random.normal(KEY, (4, 32, 32, 32))
    alpha = (jax.random.uniform(KEY, (4, 32, 32, 1)) > 0.4).astype(jnp.float32)
    params = m.init(KEY, x, alpha)

    ref = m.apply(params, x, alpha)

    sh = NamedSharding(mesh2d, P("data", "space", None, None))
    xs = jax.device_put(x, sh)
    alphas = jax.device_put(alpha, sh)
    ps = jax.device_put(params, NamedSharding(mesh2d, P()))
    out = jax.jit(lambda p, a, b: m.apply(p, a, b))(ps, xs, alphas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_mask_codec_spatially_sharded(mesh2d):
    """Full mask-codec forward with batch over `data` AND height over
    `space` — the large-image scaling path (conv halos + window grid)."""
    model = MaskCodec()
    mask = (jax.random.uniform(KEY, (4, 128, 128, 1)) > 0.5).astype(jnp.float32)
    params = model.init({"params": KEY, "noise": KEY}, mask,
                        training=False)["params"]
    ref = model.apply({"params": params}, mask, training=False)

    sh = NamedSharding(mesh2d, P("data", "space", None, None))
    masks = jax.device_put(mask, sh)
    ps = jax.device_put(params, NamedSharding(mesh2d, P()))
    out = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           training=False))(ps, masks)
    np.testing.assert_allclose(float(out["bpp"]), float(ref["bpp"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["x_hat"]),
                               np.asarray(ref["x_hat"]),
                               rtol=5e-4, atol=5e-4)
