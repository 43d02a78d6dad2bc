"""Experiment: how much of the fused DSE kernel's time is border masking?

Times fused_dse with no_mask=True (border-wrong, mask ops removed) vs the
correct kernel vs the XLA chain, on serving shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.core.precision import BF16_POLICY
from rgba_tpu.ops.enhance import DSE, dse_xla
from rgba_tpu.ops.pallas.dse import fused_dse
from rgba_tpu.utils.benchmark import device_time

B = 16


def main():
    print(jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    cio = 3
    m = DSE(in_ch=cio, policy=BF16_POLICY)
    x0 = jnp.zeros((B, 512, 768, cio), jnp.bfloat16)
    params = m.init(key, x0)["params"]
    ks = jax.random.split(key, 4)
    xs = [(jax.random.normal(k, (B, 512, 768, cio), jnp.bfloat16),)
          for k in ks]

    pdict = jax.tree.map(lambda v: v, params)  # plain dict

    xla = jax.jit(lambda x: dse_xla(x, pdict, BF16_POLICY, False))
    fused = jax.jit(lambda x: fused_dse(x, pdict, leaky=False))
    nopat = jax.jit(lambda x: fused_dse(x, pdict, leaky=False,
                                        no_patches=True))
    wide = jax.jit(lambda x: fused_dse(x, pdict, leaky=False,
                                       tile=(32, 64)))

    for name, fn in (("xla", xla), ("fused_t32x32", fused),
                     ("nopatches", nopat), ("fused_t32x64", wide)):
        o = np.asarray(fn(*xs[0][0:1]), np.float32)
        t = device_time(fn, xs, iters=10)
        print(f"{name:14s} {t * 1e3:7.2f} ms  (out mean {o.mean():.4f})",
              flush=True)


if __name__ == "__main__":
    main()
