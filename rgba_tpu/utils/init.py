"""Host-CPU flax initialization.

``Module.init`` is un-jitted: it executes one primitive at a time on the
default backend.  Through the axon remote-compile tunnel every eager
primitive pays a compile round trip, so a model-sized init silently
stalls for tens of minutes with near-zero host CPU (observed: the RGB
codec's training init hung 38 and 49 min and was killed by the sweep
watchdog both times; the mask codec's smaller graph took minutes).

Running the same init on the LOCAL CPU backend takes seconds and yields
bit-identical params — JAX's threefry PRNG and fp32 init math are
backend-deterministic — after which the caller transfers the tree to
the device once.  This mirrors the reference, whose torch modules
construct their parameters on the host too (e.g.
/root/reference/trainRGB.py builds AutoEncoder() before .cuda()).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cpu_init"]


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), tree)


def cpu_init(module, rngs, *args, **static_kwargs):
    """``module.init(rngs, *args, **static_kwargs)`` on the local CPU.

    ``args`` may be numpy or device arrays (fetched to host first);
    ``static_kwargs`` (e.g. ``training=False``) are passed through
    untouched.  Returns the variables dict with CPU-resident leaves —
    ``jax.device_put`` the result (or feed it to a checkpoint loader as
    a template) yourself.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    host_args = _to_host(args)
    host_rngs = {k: np.asarray(jax.device_get(v)) for k, v in rngs.items()}
    with jax.default_device(cpu):
        dev_rngs = {k: jnp.asarray(v) for k, v in host_rngs.items()}
        dev_args = jax.tree_util.tree_map(jnp.asarray, host_args)
        return module.init(dev_rngs, *dev_args, **static_kwargs)
