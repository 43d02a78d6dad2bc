"""Export the serving forward as a StableHLO artifact for the real TPU,
then deserialize and execute it on-chip, proving artifact == live model.

Usage (one TPU process at a time; remote compile takes minutes):
  PYTHONPATH=/root/.axon_site:/root/repo python -u tools/export_artifact.py \
      [--batch 16] [--hw 512 768] [--policy serve] [--out /tmp/rgba_serve.shlo]

The artifact is self-contained (weights bundled). A deployment process
runs it with:
  art = rgba_tpu.eval.export.load_artifact(path)
  out = jax.jit(art.call)(images, masks)      # dict: x_hat, bpp, ...
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hw", type=int, nargs=2, default=(512, 768))
    p.add_argument("--policy", default="serve")
    p.add_argument("--out", default="/tmp/rgba_serve.shlo")
    p.add_argument("--rgb-weights", default="", help="RGB codec checkpoint "
                   "to bundle (.ckpt or reference .pth.tar); random if empty")
    p.add_argument("--mask-weights", default="", help="mask codec checkpoint")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from rgba_tpu.core.precision import policy_from_str
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.export import (export_serving_forward, save_artifact,
                                      load_artifact)
    from rgba_tpu.models.pipeline import RGBAPipeline

    print("devices:", jax.devices(), flush=True)
    h, w = args.hw
    model = RGBAPipeline(policy=policy_from_str(args.policy))
    d = synthetic_rgba_batch(args.batch, h, w, seed=0)
    x = jnp.asarray(d["masked_image"])
    m = jnp.asarray(d["alpha"])

    rng = jax.random.PRNGKey(0)
    # init via a default-policy twin on the host CPU (utils/init.py):
    # params are policy-independent and fused routing can't lower on CPU
    from rgba_tpu.utils.init import cpu_init
    variables = cpu_init(RGBAPipeline(), {"params": rng, "noise": rng},
                         d["masked_image"][:1], d["alpha"][:1],
                         training=False)
    if args.rgb_weights or args.mask_weights:
        from rgba_tpu.cli.common import load_params_if
        params = dict(variables["params"])
        if args.rgb_weights:
            params["rgb_codec"], _ = load_params_if(
                args.rgb_weights, params["rgb_codec"])
        if args.mask_weights:
            params["mask_codec"], _ = load_params_if(
                args.mask_weights, params["mask_codec"])
        variables = {"params": params}

    t0 = time.time()
    exp = export_serving_forward(model, variables, (x, m),
                                 platforms=("tpu",))
    nbytes = save_artifact(exp, args.out)
    print(f"exported {args.out}: {nbytes/1e6:.2f} MB "
          f"(lower+serialize {time.time()-t0:.1f}s)", flush=True)

    # live reference output
    want = jax.jit(lambda v, a, b: model.apply(v, a, b, training=False))(
        variables, x, m)
    want_x = np.asarray(want["x_hat"])

    # execute the artifact from the serialized bytes
    art = load_artifact(args.out)
    t0 = time.time()
    got = jax.jit(art.call)(x, m)
    got_x = np.asarray(got["x_hat"])
    print(f"artifact executed in {time.time()-t0:.1f}s (incl. compile)",
          flush=True)

    err = float(np.max(np.abs(got_x.astype(np.float32)
                              - want_x.astype(np.float32))))
    print(f"max |artifact - live| on x_hat: {err:.3e}")
    print("bpp artifact/live:", float(np.asarray(got["bpp"]).mean()),
          float(np.asarray(want["bpp"]).mean()))
    assert err == 0.0, "artifact must reproduce the live model bit-exactly"
    print("OK: artifact == live model on TPU")


if __name__ == "__main__":
    main()
