"""Find the toxic composition: stages are fast alone, 100x slow fused.

tools/bisect_probe.py: mask fwd 17 ms + encoder 9 + prior 8.5 + decoder
14 + pyramid/constraint ~19 = ~68 ms/call at (4,256,384), while ONE jit
of the whole pipeline runs 8.5 s at (16,256,384).  This times pairwise
and cumulative compositions under a single jit to find which junction
triggers the pathological schedule in the remote XLA compiler.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/compose_probe.py
"""

import time

import jax
import jax.numpy as jnp

from rgba_tpu.utils.benchmark import device_time

KEY = jax.random.PRNGKey(0)
B, H, W = 4, 256, 384


def report(name, fn, inputs, iters=4):
    t0 = time.time()
    dt = device_time(jax.jit(fn), inputs, iters=iters)
    print(f"{name}: {dt * 1000:.1f} ms/call   "
          f"[wall incl compile {time.time() - t0:.0f}s]", flush=True)
    return dt


def main():
    print(jax.devices(), flush=True)
    from rgba_tpu.core.precision import BF16_POLICY
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    from rgba_tpu.ops.morphology import constraint_rgb
    from rgba_tpu.utils.init import cpu_init

    rng = jax.random.PRNGKey(0)
    mask_model = MaskCodec(policy=BF16_POLICY)
    rgb_model = RGBCodec(policy=BF16_POLICY)
    d0 = synthetic_rgba_batch(1, H, W, seed=0)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(d0["alpha"]))
    mp = jax.device_put(cpu_init(
        MaskCodec(), {"params": rng, "noise": rng}, d0["alpha"],
        training=False)["params"])
    rp = jax.device_put(cpu_init(
        RGBCodec(), {"params": rng, "noise": rng}, d0["masked_image"],
        d0["alpha"], d0["alpha"], me0, training=False)["params"])

    ds = [synthetic_rgba_batch(B, H, W, seed=s) for s in range(2)]
    xs = [(jax.device_put(jnp.asarray(d["masked_image"])),
           jax.device_put(jnp.asarray(d["alpha"]))) for d in ds]

    def front(x, m):
        me = mask_pyramid(m)
        r = mask_model.apply({"params": mp}, m, training=False)
        rm = jnp.clip(r["x_hat"], 0.0, 1.0)
        rm = jnp.round(rm * 255.0) / 255.0
        rm = constraint_rgb(rm)
        return jnp.where(rm > 0, x, rm), rm, me[1], me[2]

    report("front (pyr+mask+constraint+where)", front, xs)

    def rgb_full(x, m):
        me = mask_pyramid(m)
        out = rgb_model.apply({"params": rp}, x, m, m, me, training=False)
        return out["x_hat"], out["bpp"]

    report("rgb codec full (enc+prior+dec)", rgb_full, xs)

    def full(x, m):
        xm, rm, me2, me3 = front(x, m)
        me = mask_pyramid(m)
        out = rgb_model.apply({"params": rp}, xm, m, rm, me,
                              training=False)
        return out["x_hat"], out["bpp"]

    report("full pipeline (one jit)", full, xs)

    # the workaround candidate: stage-split dispatch (2 executables)
    f_front = jax.jit(front)
    f_rgb = jax.jit(lambda xm, m, rm: (lambda me: rgb_model.apply(
        {"params": rp}, xm, m, rm, me, training=False))(mask_pyramid(m)))

    def split(x, m):
        xm, rm, _, _ = f_front(x, m)
        out = f_rgb(xm, m, rm)
        return out["x_hat"], out["bpp"]

    t0 = time.time()
    out = split(*xs[0])
    jax.device_get(out[1])
    print(f"[split compile {time.time() - t0:.0f}s]", flush=True)
    t0 = time.time()
    iters = 4
    for i in range(iters):
        out = split(*xs[i % 2])
    jax.device_get(out[1])
    print(f"split dispatch (2 executables): "
          f"{(time.time() - t0) / iters * 1000:.1f} ms/call", flush=True)


if __name__ == "__main__":
    main()
