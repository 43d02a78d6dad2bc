"""Round-4 follow-up: which arg-passing styles dodge the forward collapse?

tools/fwd_matrix_probe.py pins the 2x2 (args vs consts x batch) at the
bench canvas.  This probe tests the candidate *mechanisms* and cures at
bigprog_probe's collapsed config (batch 16 @ 256x384, params as args,
8.5 s/call there):

  A) params as a normal pytree of args        (baseline, expect slow)
  B) params raveled into ONE flat fp32 buffer (unravel inside jit) —
     distinguishes per-argument-buffer overhead from bytes-transferred
  C) trainer-style: params donated and passed through the output —
     round-3 training was NOT observed collapsed, and donation is the
     structural difference between the trainer and the bench forward
  D) one real RGBTrainer-shaped step timing for reference

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/argleaf_probe.py
"""

import os
import time

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from rgba_tpu.utils.benchmark import device_time

H, W, B = 256, 384, 16


def report(name, fn, inputs, iters=3):
    t0 = time.time()
    dt = device_time(fn, inputs, iters=iters)
    print(f"{name}: {dt * 1000:.1f} ms/call  [wall {time.time() - t0:.0f}s]",
          flush=True)
    return dt


def main():
    arms = os.environ.get("ARMS", "ABC")
    print(jax.devices(), flush=True)
    from rgba_tpu.core.precision import BF16_POLICY
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.models.pipeline import RGBAPipeline
    from rgba_tpu.utils.init import cpu_init

    model = RGBAPipeline(policy=BF16_POLICY)
    rng = jax.random.PRNGKey(0)
    d0 = synthetic_rgba_batch(1, H, W, seed=0)
    params = jax.device_put(cpu_init(
        RGBAPipeline(), {"params": rng, "noise": rng}, d0["masked_image"],
        d0["alpha"], training=False)["params"])
    nleaves = len(jax.tree_util.tree_leaves(params))
    print(f"param leaves: {nleaves}", flush=True)

    def fwd(p, x, m):
        out = model.apply({"params": p}, x, m, training=False)
        return out["x_hat"], out["bpp"]

    def data(n=2):
        ins = []
        for s in range(n):
            d = synthetic_rgba_batch(B, H, W, seed=s)
            ins.append((jax.device_put(jnp.asarray(d["masked_image"])),
                        jax.device_put(jnp.asarray(d["alpha"]))))
        return ins

    xs = data()

    if "A" in arms:
        # A) baseline: params as a pytree of args
        report("A args-tree ", jax.jit(fwd), [(params,) + x for x in xs])

    if "B" in arms:
        # B) params raveled to one flat buffer, unravel traced inside jit
        flat, unravel = ravel_pytree(params)
        flat = jax.device_put(flat)
        report("B args-flat ", jax.jit(lambda f, x, m: fwd(unravel(f), x, m)),
               [(flat,) + x for x in xs])

    if "C" in arms:
        # C) trainer-style: params donated, passed through the output
        step = jax.jit(lambda p, x, m: (p, fwd(p, x, m)[1]),
                       donate_argnums=(0,))
        p = jax.device_put(params)  # fresh copy we may consume
        p, bpp = step(p, *xs[0])
        float(bpp)  # sync: compile + warmup done
        t0 = time.perf_counter()
        iters = 3
        for i in range(iters):
            p, bpp = step(p, *xs[i % 2])
        float(bpp)
        print(f"C donated   : {(time.perf_counter() - t0) / iters * 1000:.1f} "
              f"ms/call", flush=True)


if __name__ == "__main__":
    main()
