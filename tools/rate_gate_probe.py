"""Measure alpha-rate gating on trained weights: bpp/PSNR with vs without.

Loads the RD-sweep λ checkpoint (tools/rd_sweep_proof.py) and runs the
Kodak-shaped serving forward with RGBAPipeline(rate_gate=True/False):
the gate pins RGB latent cells whose /8 recon-alpha pool is exactly 0 to
y_hat=mu (zero estimated bits).  Reports the rate saved and the PSNR
cost (should be ~0: gated cells sit ≥ the pool receptive field away from
any visible pixel).  Usage: python -u tools/rate_gate_probe.py [lam=4096]
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
from rgba_tpu.models.pipeline import RGBAPipeline
from rgba_tpu.utils.benchmark import device_time
from tools.int8_quality_probe import load_trained_params


def main():
    lam = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(jax.devices(), flush=True)
    params = jax.device_put(load_trained_params(lam))

    batch, h, w = 16, 512, 768
    datas = [synthetic_rgba_batch(batch, h, w, seed=s) for s in range(4)]
    xs = [jnp.asarray(d["masked_image"]) for d in datas]
    ms = [jnp.asarray(d["alpha"]) for d in datas]
    # share of latent cells the gate can skip (GT-alpha approximation)
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    gate_share = float(np.mean([
        np.mean(np.asarray(mask_pyramid(m)[2]) == 0.0) for m in ms]))

    results = {}
    for name, gated in (("serve", False), ("serve+gate", True)):
        model = RGBAPipeline(policy=policy_from_str("serve"),
                             rate_gate=gated)

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
        }
        print(name, json.dumps(results[name]), flush=True)

    d_psnr = results["serve+gate"]["psnr_db"] - results["serve"]["psnr_db"]
    d_bpp = results["serve+gate"]["bpp"] - results["serve"]["bpp"]
    print(json.dumps({"lam": lam, "gate_zero_share": round(gate_share, 4),
                      "gate_vs_serve": {
                          "d_psnr_db": round(d_psnr, 4),
                          "d_bpp": round(d_bpp, 5),
                          "rate_saving_pct": round(
                              -100.0 * d_bpp / results["serve"]["bpp"], 2)}}),
          flush=True)


if __name__ == "__main__":
    main()
