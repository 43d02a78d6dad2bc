"""Honest per-component TPU timings (see rgba_tpu/utils/benchmark.py for
the tunnel-safe protocol). Run: python tools/profile_components.py"""

import os

import jax
import jax.numpy as jnp

from rgba_tpu.core.precision import BF16_POLICY, SERVE_POLICY
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.ops.attention import SimplifiedAttention, WinGateAttention
from rgba_tpu.ops.conv import Conv, ConvTranspose
from rgba_tpu.ops.enhance import DSE
from rgba_tpu.ops.gdn import GDN
from rgba_tpu.ops.mask_pyramid import mask_pyramid
from rgba_tpu.utils.benchmark import device_time

KEY = jax.random.PRNGKey(0)
BF = jnp.bfloat16
P = SERVE_POLICY if os.environ.get("PROFILE_POLICY") == "serve" else BF16_POLICY
B = int(os.environ.get("PROFILE_BATCH", "4"))


def mk(shape, n=8, dtype=BF):
    return [(jax.random.normal(jax.random.PRNGKey(i), shape, dtype),)
            for i in range(n)]


def report(name, fn, inputs, iters=16, flops=None):
    dt = device_time(fn, inputs, iters=iters)
    extra = f"  ({flops / dt / 1e12:.1f} TF/s)" if flops else ""
    print(f"{name}: {dt * 1000:.2f} ms{extra}", flush=True)
    return dt


def module_fn(mod, x0, **kw):
    p = mod.init(KEY, x0, **kw)
    return jax.jit(lambda x: mod.apply(p, x, **kw))


def main():
    x_hd = mk((B, 256, 384, 192))
    x_qd = mk((B, 128, 192, 192))
    fl_deconv = B * 512 * 768 * 192 * 192 * 25 / 4 * 2

    m = ConvTranspose(192, 5, 2, policy=P)
    report("deconv s2 192ch @256x384 (subpixel)", module_fn(m, x_hd[0][0]),
           x_hd, flops=fl_deconv)
    m2 = ConvTranspose(192, 5, 2, policy=P, use_subpixel=False)
    report("deconv s2 192ch @256x384 (dilated) ", module_fn(m2, x_hd[0][0]),
           x_hd, flops=fl_deconv)

    fl_conv = B * 128 * 192 * 192 * 192 * 25 * 2
    c1 = Conv(192, 5, 2, policy=P)
    report("conv s2 192ch @256x384 (s2d)    ", module_fn(c1, x_hd[0][0]),
           x_hd, flops=fl_conv)
    c2 = Conv(192, 5, 2, policy=P, use_space_to_depth=False)
    report("conv s2 192ch @256x384 (direct) ", module_fn(c2, x_hd[0][0]),
           x_hd, flops=fl_conv)

    report("GDN @256x384", module_fn(GDN(policy=P), x_hd[0][0]), x_hd)
    report("WinGate 192 w8 @128x192",
           module_fn2(WinGateAttention(192, 8, 8, 4, policy=P), x_qd), x_qd)
    report("SimpAttn 192 @128x192",
           module_fn(SimplifiedAttention(192, policy=P), x_qd[0][0]), x_qd)
    x_full = mk((B, 512, 768, 3))
    report("DSE @512x768", module_fn(DSE(in_ch=3, policy=P), x_full[0][0]),
           x_full)

    # whole models
    masks = [(jnp.asarray((jax.random.uniform(jax.random.PRNGKey(i),
                                              (B, 512, 768, 1)) > 0.5),
                          jnp.float32),) for i in range(8)]
    from rgba_tpu.utils.init import cpu_init
    mc = MaskCodec(policy=P)
    # host-CPU init via a default-policy twin (utils/init.py): params are
    # policy-independent; eager on-device init stalls through the tunnel
    pm = jax.device_put(cpu_init(
        MaskCodec(), {"params": KEY, "noise": KEY},
        masks[0][0], training=False)["params"])
    report("mask codec fwd @512x768", jax.jit(
        lambda m_: mc.apply({"params": pm}, m_, training=False)["bpp"]),
        masks, iters=8)

    rc = RGBCodec(policy=P)
    imgs = [(jax.random.uniform(jax.random.PRNGKey(100 + i),
                                (B, 512, 768, 3)),) for i in range(8)]
    me = mask_pyramid(masks[0][0])
    pr = jax.device_put(cpu_init(
        RGBCodec(), {"params": KEY, "noise": KEY}, imgs[0][0],
        masks[0][0], masks[0][0], me, training=False)["params"])

    def rgb_fwd(x):
        return rc.apply({"params": pr}, x, masks[0][0], masks[0][0], me,
                        training=False)["bpp"]
    report("rgb codec fwd @512x768", jax.jit(rgb_fwd), imgs, iters=8)
    print("DONE", flush=True)


def module_fn2(mod, inputs):
    alpha = jnp.ones(inputs[0][0].shape[:3] + (1,))
    p = mod.init(KEY, inputs[0][0], alpha)
    return jax.jit(lambda x: mod.apply(p, x, alpha))


if __name__ == "__main__":
    main()
