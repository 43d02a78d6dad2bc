"""Probe whether JAX's persistent compilation cache works under the axon
tunnel (remote compiler).  If it does, every bench/tool process saves the
multi-minute recompiles of model-sized executables.

Run twice: first run populates /tmp/jax_cache, second should compile in
seconds.  Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python -u tools/cache_probe.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    print("devices:", jax.devices(), flush=True)
    from rgba_tpu.core.precision import SERVE_POLICY
    from rgba_tpu.models.pipeline import RGBAPipeline

    model = RGBAPipeline(policy=SERVE_POLICY)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 256, 384, 3))
    m = jnp.ones((2, 256, 384, 1))
    t0 = time.time()
    params = model.init({"params": rng, "noise": rng}, x[:1], m[:1],
                        training=False)["params"]

    @jax.jit
    def step(p, x, m):
        return model.apply({"params": p}, x, m, training=False)["bpp"]

    out = step(params, x, m)
    float(jax.device_get(out))
    print(f"first step (incl. compile): {time.time() - t0:.1f}s", flush=True)
    import os
    entries = os.listdir("/tmp/jax_cache") if os.path.isdir(
        "/tmp/jax_cache") else []
    print(f"cache entries: {len(entries)}", flush=True)


if __name__ == "__main__":
    main()
