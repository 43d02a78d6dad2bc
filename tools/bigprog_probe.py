"""Does the degradation scale with pixels, batch, or PROGRAM SIZE?

Round-4 ladder (tools/degradation_probe.py) showed every micro-op at
healthy speed while the full model forward runs ~40x slow (1.4-1.6
img/s vs 61 in round 2b) — on the same byte-identical code.  The
remaining variable is the executable itself: this probe times
  (a) the full RGBA pipeline at two canvases and two batches,
  (b) a pure conv3x3 CHAIN of depth 8 / 64 / 256 at fixed shape
      (same per-op work, growing op count),
so the per-call overhead can be attributed to compute (scales with
pixels*batch), dispatch (constant), or program size (scales with depth).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/bigprog_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.utils.benchmark import device_time

KEY = jax.random.PRNGKey(0)


def report(name, fn, inputs, iters=6):
    dt = device_time(fn, inputs, iters=iters)
    print(f"{name}: {dt * 1000:.1f} ms/call", flush=True)
    return dt


def conv_chain(depth):
    w = jax.random.normal(KEY, (3, 3, 96, 96), jnp.bfloat16)

    @jax.jit
    def f(a):
        for _ in range(depth):
            a = jax.lax.conv_general_dilated(
                a, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return a
    return f


def main():
    print(jax.devices(), flush=True)
    from rgba_tpu.core.precision import BF16_POLICY
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.models.pipeline import RGBAPipeline
    from rgba_tpu.utils.init import cpu_init

    t0 = time.time()
    x = [(jax.device_put(jax.random.normal(
        jax.random.fold_in(KEY, i), (8, 64, 96, 96), jnp.bfloat16)),)
        for i in range(3)]
    for depth in (8, 64, 256):
        report(f"conv3x3x96 chain depth {depth:3d}", conv_chain(depth), x)
    print(f"[chains done at {time.time() - t0:.0f}s]", flush=True)

    model = RGBAPipeline(policy=BF16_POLICY)
    rng = jax.random.PRNGKey(0)
    d0 = synthetic_rgba_batch(1, 256, 384, seed=0)
    params = jax.device_put(cpu_init(
        RGBAPipeline(), {"params": rng, "noise": rng}, d0["masked_image"],
        d0["alpha"], training=False)["params"])

    @jax.jit
    def fwd(p, xx, mm):
        out = model.apply({"params": p}, xx, mm, training=False)
        return out["x_hat"], out["bpp"]

    for (b, h, w) in ((16, 256, 384), (1, 512, 768), (16, 512, 768)):
        ins = []
        for s in range(2):
            d = synthetic_rgba_batch(b, h, w, seed=s)
            ins.append((params, jax.device_put(jnp.asarray(d["masked_image"])),
                        jax.device_put(jnp.asarray(d["alpha"]))))
        dt = report(f"pipeline b{b} {h}x{w}",
                    lambda p, xx, mm: fwd(p, xx, mm), ins,
                    iters=4)
        print(f"  = {b / dt:.2f} img/s", flush=True)
        print(f"[at {time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
