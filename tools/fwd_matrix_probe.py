"""Pin down the round-3/4 forward collapse: args vs constants, batch, split.

Facts so far (logs in PERFORMANCE.md round-4 section):
  - raw ops healthy (matmul 134-145 TF/s, convs, 1 GB streams, empty
    dispatch ~2 ms) — tools/degradation_probe.py
  - each pipeline stage alone fast (sum ~68 ms at b4 256x384) —
    tools/bisect_probe.py
  - full pipeline ONE jit, params CLOSED OVER, b4 256x384: 31.7 ms/call
    (healthy) — tools/compose_probe.py
  - full pipeline one jit, params AS ARGS (bench-style), b16 256x384:
    8.5 s/call; b1 512x768: 58 s/call; b16 512x768: 14 s/call —
    tools/bigprog_probe.py

Two variables distinguish fast from slow: params passed as runtime
arguments vs closed over as constants, and the batch/canvas.  This probe
runs the 2x2 at the bench canvas so the workaround is unambiguous.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/fwd_matrix_probe.py
"""

import time

import jax
import jax.numpy as jnp

from rgba_tpu.utils.benchmark import device_time

H, W = 512, 768


def report(name, fn, inputs, iters=3):
    t0 = time.time()
    dt = device_time(fn, inputs, iters=iters)
    b = inputs[0][-1].shape[0]
    print(f"{name}: {dt * 1000:.1f} ms/call = {b / dt:.2f} img/s  "
          f"[wall incl compile {time.time() - t0:.0f}s]", flush=True)
    return dt


def main():
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

    def fwd(p, x, m):
        out = model.apply({"params": p}, x, m, training=False)
        return out["x_hat"], out["bpp"]

    def inputs(b, with_params):
        ins = []
        for s in range(2):
            d = synthetic_rgba_batch(b, H, W, seed=s)
            args = (jax.device_put(jnp.asarray(d["masked_image"])),
                    jax.device_put(jnp.asarray(d["alpha"])))
            ins.append((params,) + args if with_params else args)
        return ins

    # A) bench-style: params as runtime args, batch 16
    report("args   b16", jax.jit(fwd), inputs(16, True))
    # B) params closed over (compile-time constants), batch 16
    report("consts b16", jax.jit(lambda x, m: fwd(params, x, m)),
           inputs(16, False))
    # C) params as args, batch 4
    report("args   b4 ", jax.jit(fwd), inputs(4, True))
    # D) params closed over, batch 4 (compose_probe's fast arm, this canvas)
    report("consts b4 ", jax.jit(lambda x, m: fwd(params, x, m)),
           inputs(4, False))


if __name__ == "__main__":
    main()
