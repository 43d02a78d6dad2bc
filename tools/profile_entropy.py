"""Entropy-head component profile (the encoder-side budget).

The round-2b profile left the encoder-side forwards unattacked (mask
52.0 + RGB 71.4 ms bpp-only at batch 16).  Both codecs share the
ChannelARPrior head (hyperprior chains + 10/5-slice AR loop of
3x-conv SliceTransforms at y-resolution 64x96); estimate ~3 TFLOP per
RGB forward in the slice loop alone.  This measures each piece on-chip
so the optimization ledger has real numbers.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/profile_entropy.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rgba_tpu.core.precision import SERVE_POLICY  # noqa: E402
from rgba_tpu.models.hyperprior import (  # noqa: E402
    ChannelARPrior, HyperAnalysis, HyperSynthesis, SliceTransform)
from rgba_tpu.models.rgb_codec import AnalysisTransform  # noqa: E402
from rgba_tpu.utils.benchmark import device_time  # noqa: E402

P = SERVE_POLICY
KEY = jax.random.PRNGKey(0)
B = 16
BF = jnp.bfloat16


def mk(shape, n=6, dtype=BF):
    return [(jax.random.normal(jax.random.fold_in(KEY, i), shape, dtype) * 2,)
            for i in range(n)]


def report(name, fn, inputs, iters=12, flops=None):
    t = device_time(fn, inputs, iters=iters)
    extra = f"  {flops / t / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:46s} {t * 1e3:8.2f} ms{extra}", flush=True)
    return t


def module_fn(mod, x0, **kw):
    p = mod.init({"params": KEY, "noise": KEY}, x0, **kw)
    return jax.jit(lambda x: mod.apply(p, x, **kw))


def main():
    h, w, m = 64, 96, 80          # y resolution for 512x768 inputs, M=80
    ys = mk((B, h, w, m))
    zs = mk((B, h // 8, w // 8, 192))

    report("h_a (M->320..192, /8)", module_fn(HyperAnalysis(policy=P),
                                              ys[0][0]), ys)
    report("h_mean_s (192->M, x8)", module_fn(
        HyperSynthesis(m, policy=P), zs[0][0]), zs)

    # one slice transform at the widest support (5 slices seen)
    for sw, tag in ((8, "rgb"), (16, "mask")):
        cin = m + 5 * sw
        xs = mk((B, h, w, cin))
        fl = 2 * B * h * w * 9 * (cin * 224 + 224 * 128 + 128 * sw)
        report(f"SliceTransform {tag} ({cin}->224->128->{sw})",
               module_fn(SliceTransform(sw, policy=P), xs[0][0]), xs,
               flops=fl)

    # the full prior heads (hyper chains + bottleneck + slice loop + lrp)
    for n_slices, tag in ((10, "rgb"), (5, "mask")):
        prior = ChannelARPrior(latent_channels=m, num_slices=n_slices,
                               policy=P)
        ys32 = [(y.astype(jnp.float32),) for (y,) in ys]
        from rgba_tpu.utils.init import cpu_init
        p = jax.device_put(cpu_init(
            type(prior)(latent_channels=m, num_slices=n_slices),
            {"params": KEY, "noise": KEY}, ys32[0][0], training=False))
        fn = jax.jit(lambda y: prior.apply(p, y, training=False)[
            "y_likelihoods"])
        report(f"ChannelARPrior full ({tag}, {n_slices} slices)", fn, ys32,
               iters=8)

    # encoder transform alone, for the encoder-side split
    imgs = mk((B, 512, 768, 3), dtype=jnp.float32)
    alpha = jnp.ones((B, 512, 768, 1), jnp.float32)
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    me = mask_pyramid(alpha)
    enc = AnalysisTransform(policy=P)
    pe = enc.init({"params": KEY}, imgs[0][0], me[1], me[2])
    report("RGB g_a alone @512x768", jax.jit(
        lambda x: enc.apply(pe, x, me[1], me[2])), imgs, iters=8)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
