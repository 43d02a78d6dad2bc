import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.ops.math import lower_bound, ste_round


def test_lower_bound_forward():
    x = jnp.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(lower_bound(x, 1.0), [1.0, 1.0, 2.0])


def test_lower_bound_gradient_gating():
    """Gradient passes iff x >= bound OR upstream grad < 0 (GDN.py:16-23)."""
    bound = 1.0

    def f(x, cot):
        y = lower_bound(x, bound)
        return jnp.sum(y * cot)

    x = jnp.array([0.5, 0.5, 2.0, 2.0])
    cot = jnp.array([1.0, -1.0, 1.0, -1.0])
    g = jax.grad(f)(x, cot)
    # below bound + positive cotangent -> blocked; all others pass
    np.testing.assert_allclose(g, [0.0, -1.0, 1.0, -1.0])


def test_ste_round():
    x = jnp.array([0.3, 1.7, -0.6])
    np.testing.assert_allclose(ste_round(x), [0.0, 2.0, -1.0])
    g = jax.grad(lambda v: jnp.sum(ste_round(v) ** 2))(x)
    # gradient flows as if ste_round were identity on the sensitivity path:
    # d/dx sum(round(x)^2) with STE = 2*round(x)
    np.testing.assert_allclose(g, 2 * np.round(np.asarray(x)))
