"""Batch-1 serving-latency probe (VERDICT-r2 item 8).

The eval forward is ALREADY a single jitted program (RGBAPipeline:
mask codec -> constraint -> RGB codec under one jax.jit — there is no
multi-executable fragmentation to fuse away, so the suggested
"donated-buffer single-program fusion" has nothing left to fuse).  What
remains measurable is where batch-1 latency actually goes:

  1. device latency of the ONE serving-forward program at batch
     1/2/4/8/16 (fixed per-op overheads + undersized MXU tiles shrink
     sublinearly with batch — the curve quantifies it);
  2. donate_argnums on the input buffers (saves the HBM alloc+copy of
     the largest operand — the only remaining single-program lever);
  3. batch-1 real enc+dec wall time split into device dispatches vs
     host syncs (the tunnel pays ~26 ms per sync; PCIe hosts ~10 us,
     so the split predicts production batch-1 latency).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/batch1_probe.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.core.precision import SERVE_POLICY
from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.models.pipeline import RGBAPipeline
from rgba_tpu.utils.benchmark import device_time

H, W = 512, 768
# each batch size is its own multi-minute remote compile under the
# tunnel — PROBE_BATCHES=1,4 runs a slim ladder when time is short
BATCHES = tuple(int(b) for b in
                os.environ.get("PROBE_BATCHES", "1,2,4,8,16").split(","))


def main():
    print(jax.devices(), flush=True)
    from rgba_tpu.utils.init import cpu_init

    model = RGBAPipeline(policy=SERVE_POLICY)
    rng = jax.random.PRNGKey(0)
    d0 = synthetic_rgba_batch(1, H, W, seed=0)
    # init via a default-policy twin: params are policy-independent and
    # the serve policy's fused routing can't lower on the CPU backend
    # ONE flat param buffer (utils/flatparams.py): the axon tunnel
    # charges ~14 ms per runtime argument buffer, so the 772-leaf tree
    # as jit args would measure the collapsed config, not the serving
    # path (PERFORMANCE.md round-4)
    from rgba_tpu.utils.flatparams import FlatParams
    fp = FlatParams(cpu_init(
        RGBAPipeline(), {"params": rng, "noise": rng},
        d0["masked_image"], d0["alpha"], training=False)["params"])
    params = fp.flat

    @jax.jit
    def fwd(p, x, m):
        return model.apply({"params": fp.unravel(p)}, x, m, training=False)

    fwd_donated = jax.jit(
        lambda p, x, m: model.apply({"params": fp.unravel(p)}, x, m,
                                    training=False),
        donate_argnums=(1, 2))

    rows = []
    for b in BATCHES:
        ins = []
        for s in range(3):
            d = synthetic_rgba_batch(b, H, W, seed=s)
            ins.append((params, jax.device_put(jnp.asarray(d["masked_image"])),
                        jax.device_put(jnp.asarray(d["alpha"]))))
        t = device_time(lambda p, x, m: fwd(p, x, m), ins, iters=12)
        rows.append((b, t))
        print(f"forward batch {b:2d}: {t * 1e3:8.1f} ms "
              f"({b / t:6.1f} img/s, {t / b * 1e3:6.1f} ms/img)", flush=True)

    # donation at batch 1: fresh device buffers per call (donated buffers
    # are consumed), timed with the same enqueue-then-fetch protocol
    dons = []
    for s in range(16):
        d = synthetic_rgba_batch(1, H, W, seed=s)
        dons.append((jax.device_put(jnp.asarray(d["masked_image"])),
                     jax.device_put(jnp.asarray(d["alpha"]))))
    o = fwd_donated(params, *dons[-1])
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]))  # compile
    t0 = time.perf_counter()
    for x, m in dons[:12]:
        o = fwd_donated(params, x, m)
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
    t_don = (time.perf_counter() - t0) / 12
    print(f"forward batch  1 donated inputs: {t_don * 1e3:.1f} ms",
          flush=True)

    # batch-1 real enc+dec: wall time + sync count
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    mask_model, rgb_model = MaskCodec(), RGBCodec()
    d = synthetic_rgba_batch(1, H, W, seed=7)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(d["alpha"]))
    mp = jax.device_put(cpu_init(
        mask_model, {"params": rng, "noise": rng}, d["alpha"],
        training=False)["params"])
    rp = jax.device_put(cpu_init(
        rgb_model, {"params": rng, "noise": rng}, d["masked_image"],
        d["alpha"], d["alpha"], me0, training=False)["params"])
    codec = RGBAFileCodec(CodecIO(rgb_model, rp, kind="rgb"),
                          CodecIO(mask_model, mp, kind="mask"))
    rgba = np.concatenate([np.asarray(d["image"]), np.asarray(d["alpha"])],
                          -1)
    blob = codec.encode_batch(rgba[..., :3], rgba[..., 3:])[0]  # compile
    codec.decode_batch([blob])
    t0 = time.perf_counter()
    blob = codec.encode_batch(rgba[..., :3], rgba[..., 3:])[0]
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    codec.decode_batch([blob])
    t_dec = time.perf_counter() - t0
    print(f"enc+dec batch 1 warm: enc {t_enc * 1e3:.0f} ms, "
          f"dec {t_dec * 1e3:.0f} ms "
          f"(tail-parallel decode: 5 mask + 5 serial RGB + 1 tail syncs; "
          f"~26 ms/sync is tunnel-only — PCIe ~10 us)", flush=True)


if __name__ == "__main__":
    main()
