"""Benchmark: Kodak-shaped RGBA eval throughput on one TPU chip.

Measures the same work the reference times at eval (trainRGB.py:281-291):
mask pyramid + mask codec forward + RGB codec forward (entropy coding
excluded), on full-size Kodak geometry (768x512), batched for throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rgba_tpu.core.precision import SERVE_POLICY
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.models.pipeline import RGBAPipeline

    # throughput metric: batch 16 is the serving sweet spot measured on
    # v5e (39.6 img/s vs 30.7 at batch 4); override with BENCH_BATCH
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    height, width = 512, 768
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    model = RGBAPipeline(policy=SERVE_POLICY)
    # several distinct batches — identical repeated executions can be
    # deduplicated by the runtime and would fake the timing
    datas = [synthetic_rgba_batch(batch, height, width, seed=s)
             for s in range(6)]
    xs = [jnp.asarray(d["masked_image"]) for d in datas]
    masks = [jnp.asarray(d["alpha"]) for d in datas]

    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "noise": rng}, xs[0][:1],
                        masks[0][:1], training=False)["params"]

    @jax.jit
    def eval_step(p, x, mask):
        out = model.apply({"params": p}, x, mask, training=False)
        return out["x_hat"], out["bpp"]

    # Timing protocol: block_until_ready is unreliable under the axon
    # tunnel (returns before remote execution completes); enqueue the whole
    # loop and force a host fetch of a scalar from the LAST output — the
    # single TPU stream runs in order, so the fetch waits for everything.
    xh, bpp = eval_step(params, xs[0], masks[0])
    float(jax.device_get(bpp))

    t0 = time.perf_counter()
    for i in range(iters):
        xh, bpp = eval_step(params, xs[i % len(xs)], masks[i % len(xs)])
    float(jax.device_get(bpp))
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt

    vs_baseline = 1.0
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            published = json.load(f).get("published", {})
        ref = published.get("images_per_sec")
        if ref:
            vs_baseline = images_per_sec / float(ref)
    except Exception:  # noqa: BLE001
        pass

    print(json.dumps({
        "metric": "kodak_rgba_eval_forward_throughput",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
