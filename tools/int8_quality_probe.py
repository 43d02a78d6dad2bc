"""Measure the int8 serving path: throughput AND quality on TRAINED weights.

Loads the RD-sweep checkpoints (/tmp/rd_sweep, tools/rd_sweep_proof.py),
assembles the joint RGBAPipeline param tree, and runs the Kodak-shaped
serving forward (batch 16, 512x768) under three policies:

  fp32 (parity anchor) | serve (bf16 + fused attn + packed DSE) | serve-int8

reporting PSNR / bpp / ms-per-batch for each.  The int8 deltas vs serve
answer "what does dynamic W8A8 cost in quality and buy in speed" with real
trained weights rather than random init (PERFORMANCE.md records the
verdict).  Usage:  python -u tools/int8_quality_probe.py [lam=4096]
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgba_tpu.core.precision import policy_from_str
from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.models.pipeline import RGBAPipeline
from rgba_tpu.ops.mask_pyramid import mask_pyramid
from rgba_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
from rgba_tpu.utils.benchmark import device_time


def load_trained_params(lam):
    from rgba_tpu.utils.init import cpu_init

    key = jax.random.PRNGKey(0)
    m0 = np.zeros((1, 256, 256, 1), np.float32)
    x0 = np.zeros((1, 256, 256, 3), np.float32)
    mask_tmpl = cpu_init(MaskCodec(), {"params": key, "noise": key}, m0,
                         training=False)["params"]
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(m0))
    rgb_tmpl = cpu_init(RGBCodec(), {"params": key, "noise": key}, x0, m0,
                        m0, me0, training=False)["params"]
    sweep_dir = os.environ.get("RD_SWEEP_DIR", "/root/repo/.rd_sweep")
    mask_ck = latest_checkpoint(os.path.join(sweep_dir, "mask_ck"))
    rgb_ck = latest_checkpoint(os.path.join(sweep_dir, f"rgb_{lam}_ck"))
    if mask_ck is None or rgb_ck is None:
        raise SystemExit(
            f"RD-sweep checkpoints not found under {sweep_dir} — run "
            "`python -u tools/rd_sweep_proof.py` first (or point "
            "RD_SWEEP_DIR at the sweep's --outdir)")
    mask_params = load_checkpoint(jax.device_get(mask_tmpl), mask_ck)
    rgb_params = load_checkpoint(jax.device_get(rgb_tmpl), rgb_ck)
    return {"mask_codec": mask_params, "rgb_codec": rgb_params}


def main():
    lam = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(jax.devices(), flush=True)
    # device-resident once — host-side numpy params would re-upload the
    # whole ~240 MB tree through the tunnel on EVERY jitted call
    params = jax.device_put(load_trained_params(lam))

    batch, h, w = 16, 512, 768
    datas = [synthetic_rgba_batch(batch, h, w, seed=s) for s in range(4)]
    xs = [jnp.asarray(d["masked_image"]) for d in datas]
    ms = [jnp.asarray(d["alpha"]) for d in datas]

    results = {}
    for name in ("fp32", "serve", "serve-int8"):
        model = RGBAPipeline(policy=policy_from_str(name))

        @jax.jit
        def step(p, x, m, model=model):
            out = model.apply({"params": p}, x, m, training=False)
            return out["x_hat"], out["bpp"], out["mse_loss"]

        xh, bpp, mse = step(params, xs[0], ms[0])
        jax.device_get(bpp)
        sec = device_time(lambda x, m: step(params, x, m)[1],
                          [(x, m) for x, m in zip(xs, ms)], iters=8)
        mses, bpps = [], []
        for x, m in zip(xs, ms):
            _, bpp, mse = step(params, x, m)
            bpps.append(float(jax.device_get(bpp)))
            mses.append(float(jax.device_get(mse)))
        psnr = 10 * np.log10(1.0 / max(np.mean(mses), 1e-12))
        results[name] = {
            "psnr_db": round(float(psnr), 4),
            "bpp": round(float(np.mean(bpps)), 5),
            "ms_per_batch16": round(sec * 1e3, 2),
            "img_per_sec": round(batch / sec, 2),
        }
        print(name, json.dumps(results[name]), flush=True)

    d_psnr = results["serve-int8"]["psnr_db"] - results["serve"]["psnr_db"]
    d_bpp = results["serve-int8"]["bpp"] - results["serve"]["bpp"]
    speedup = (results["serve"]["ms_per_batch16"]
               / results["serve-int8"]["ms_per_batch16"])
    print(json.dumps({"lam": lam, "int8_vs_serve": {
        "d_psnr_db": round(d_psnr, 4), "d_bpp": round(d_bpp, 5),
        "speedup": round(speedup, 3)}}), flush=True)


if __name__ == "__main__":
    main()
