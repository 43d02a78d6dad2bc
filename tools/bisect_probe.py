"""Bisect the round-4 slowdown: which pipeline stage is pathological?

tools/bigprog_probe.py showed the full RGBA pipeline at 8.5-58 s/call
(any batch/canvas) while conv chains and micro-ops run at healthy speed.
This times each stage of RGBAPipeline separately at (4, 256, 384):
mask_pyramid, constraint, MaskCodec fwd, RGB encoder, RGB prior, RGB
decoder — then the slow one can be descended into.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/bisect_probe.py
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
    masks = [(m,) for _, m in xs]

    report("mask_pyramid", lambda m: mask_pyramid(m)[2], masks)
    report("constraint_rgb", constraint_rgb, masks)
    report("mask codec fwd",
           lambda m: mask_model.apply({"params": mp}, m,
                                      training=False)["x_hat"], masks)

    me = [mask_pyramid(m[0]) for m in masks]
    enc_in = [(x, e[1], e[2]) for (x, _), e in zip(xs, me)]

    def encode(x, m2, m3):
        return rgb_model.apply({"params": rp}, x, m2, m3,
                               method=RGBCodec.encode_latent)

    report("rgb encoder", encode, enc_in)

    y = [(encode(*e),) for e in enc_in]
    jax.block_until_ready(y[0][0])

    def prior_fwd(yy):
        return rgb_model.apply(
            {"params": rp}, yy, training=False,
            method=lambda mod, a, training: mod.prior(
                a, training=training))["y_hat"]

    report("rgb prior", prior_fwd, y)

    dec_in = [(prior_fwd(yy[0]), e[1], e[2]) for yy, e in zip(y, me)]
    jax.block_until_ready(dec_in[0][0])

    def decode(yh, m2, m3):
        return rgb_model.apply({"params": rp}, yh, m2, m3,
                               method=RGBCodec.decode_latent)

    report("rgb decoder", decode, dec_in)


if __name__ == "__main__":
    main()
