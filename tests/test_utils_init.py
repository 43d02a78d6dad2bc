"""cpu_init (utils/init.py): host-CPU flax init.

On the TPU, un-jitted Module.init pays a remote compile per eager
primitive (40+ min for the RGB codec — see CLAUDE.md); cpu_init runs the
same init on the local CPU backend.  These tests pin that the result is
bit-identical to a direct init (threefry PRNG and fp32 init math are
backend-deterministic) and that numpy/device inputs both work.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.utils.init import cpu_init


def test_cpu_init_matches_direct_init():
    m0 = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    key = jax.random.PRNGKey(3)
    model = MaskCodec()
    a = cpu_init(model, {"params": key, "noise": key}, m0,
                 training=False)["params"]
    b = model.init({"params": key, "noise": key}, jnp.asarray(m0),
                   training=False)["params"]
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (pa, xa), (_, xb) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                      err_msg=str(pa))


def test_cpu_init_accepts_device_arrays():
    m0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    params = cpu_init(MaskCodec(), {"params": key, "noise": key}, m0,
                      training=False)["params"]
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and all(np.all(np.isfinite(np.asarray(l)))
                          for l in leaves)
