"""Component ladder to localize a chip/tunnel degradation.

BENCH_r03 post-mortem follow-up: the round-4 capture shows a healthy raw
matmul (133 TF/s) but a ~40x collapse of the model forward — so the
degradation (if real) is component-specific, not raw MXU.  This ladder
times one representative op per resource class against the healthy
round-1/2 numbers recorded in PERFORMANCE.md "Device characterization":

  matmul 8192^3 bf16      MXU          healthy 173 TF/s
  1 GB fp32 stream (x+1)  HBM          healthy ~370 GB/s
  conv3x3 C=192 @64x96    MXU via conv healthy 30-45% MXU
  conv5x5 s2 3->192       input conv   (DSE class, ~6% MXU healthy)
  GDN @256x384 C=192      VPU/HBM      healthy ~3.2 ms
  empty dispatch          fixed        healthy ~3 ms/exec

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/degradation_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.utils.benchmark import device_time

KEY = jax.random.PRNGKey(0)


def mk(shape, n=4, dtype=jnp.bfloat16):
    return [(jax.device_put(jax.random.normal(
        jax.random.fold_in(KEY, i), shape, dtype)),) for i in range(n)]


def report(name, fn, inputs, iters=12, flops=None, gbytes=None):
    dt = device_time(jax.jit(fn), inputs, iters=iters)
    extra = ""
    if flops:
        extra = f"  ({flops / dt / 1e12:.1f} TF/s)"
    if gbytes:
        extra += f"  ({gbytes / dt:.0f} GB/s)"
    print(f"{name}: {dt * 1000:.2f} ms{extra}", flush=True)
    return dt


def main():
    print(jax.devices(), flush=True)
    t0 = time.time()

    n = 8192
    mm = mk((n, n))
    a2 = mk((n, n))
    report("matmul 8192^3 bf16", lambda a: a @ a2[0][0], mm,
           flops=2 * n ** 3)

    big = mk((256, 1024, 1024), n=2, dtype=jnp.float32)  # 1 GB
    report("1GB fp32 stream x+1", lambda a: a + 1.0, big, iters=6,
           gbytes=2.0)

    x = mk((16, 64, 96, 192))
    w = jax.random.normal(KEY, (3, 3, 192, 192), jnp.bfloat16)
    report("conv3x3 192->192 @16x64x96",
           lambda a: jax.lax.conv_general_dilated(
               a, w, (1, 1), "SAME",
               dimension_numbers=("NHWC", "HWIO", "NHWC")),
           x, flops=2 * 16 * 64 * 96 * 9 * 192 * 192)

    xi = mk((16, 512, 768, 3))
    wi = jax.random.normal(KEY, (5, 5, 3, 192), jnp.bfloat16)
    report("conv5x5 s2 3->192 @16x512x768",
           lambda a: jax.lax.conv_general_dilated(
               a, wi, (2, 2), "SAME",
               dimension_numbers=("NHWC", "HWIO", "NHWC")),
           xi, flops=2 * 16 * 256 * 384 * 25 * 3 * 192)

    g = mk((16, 256, 384, 192), n=2)
    gb = jnp.abs(jax.random.normal(KEY, (192,), jnp.float32)) + 0.1
    gw = jnp.abs(jax.random.normal(KEY, (192, 192), jnp.float32)) * 1e-2
    report("gdn-ish @16x256x384x192",
           lambda a: (a.astype(jnp.float32) / jnp.sqrt(
               gb + jnp.square(a.astype(jnp.float32)) @ gw)).astype(
                   jnp.bfloat16),
           g, iters=6)

    tiny = mk((8, 128))
    report("empty-ish dispatch", lambda a: a * 2.0, tiny, iters=32)

    print(f"total wall (incl. compiles): {time.time() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
