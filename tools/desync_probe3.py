"""Isolate the set_params checkpoint-swap path as the codec_err trigger.

The sweep eval reuses ONE RGBAFileCodec across models via
CodecIO.set_params (compiles paid once); desync_probe2 tests a FRESH
codec at rgb_1024.  This drives the exact eval sequence: build the
codec with rgb_256's weights, measure |decode - forward| on one tree
image, set_params to rgb_1024, re-measure — if the error appears only
after the swap, some executable or table is stale after set_params.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u \
    tools/desync_probe3.py --outdir /root/repo/.rd_sweep
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/root/repo/.rd_sweep")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    print(jax.devices(), flush=True)
    from rgba_tpu.data.datasets import KodakDataset
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.eval.kodak import _make_codec_forward
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    from rgba_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from rgba_tpu.utils.init import cpu_init

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    m0 = np.zeros((1, 256, 256, 1), np.float32)
    x0 = np.zeros((1, 256, 256, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(m0))
    t0 = time.time()
    mask_tmpl = jax.device_get(cpu_init(
        mask_model, {"params": key, "noise": key}, m0,
        training=False)["params"])
    rgb_tmpl = jax.device_get(cpu_init(
        rgb_model, {"params": key, "noise": key}, x0, m0, m0, me0,
        training=False)["params"])
    print(f"cpu_init {time.time() - t0:.0f}s", flush=True)
    mask_params = load_checkpoint(
        mask_tmpl, latest_checkpoint(f"{args.outdir}/mask_ck"))

    def rgb_of(name):
        return load_checkpoint(
            rgb_tmpl, latest_checkpoint(f"{args.outdir}/{name}_ck"))

    codec_forward = _make_codec_forward(rgb_model)
    ds = KodakDataset(f"{args.outdir}/kodak")
    item = ds.get(0)

    def measure(codec, rgb_params, tag):
        blob = codec.encode(item["image"][None], item["alpha"][None])
        rgba = codec.decode(blob)
        rm = rgba[..., 3:]
        masked = np.where(rm > 0, item["image"][None], rm)
        x_fwd = jax.device_get(codec_forward(
            rgb_params, jnp.asarray(masked), jnp.asarray(rm)))
        err = float(np.abs(rgba[..., :3] - x_fwd).max())
        print(f"{tag}: bytes {len(blob)}, |dec-fwd| {err:.6f}", flush=True)
        return err

    p256 = rgb_of("rgb_256")
    p1024 = rgb_of("rgb_1024")
    codec = RGBAFileCodec(CodecIO(rgb_model, p256, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))
    measure(codec, p256, "fresh rgb_256")
    codec.rgb_io.set_params(p1024)
    codec.mask_io.set_params(mask_params)
    e_swap = measure(codec, p1024, "after set_params -> rgb_1024")
    # same weights in a FRESH codec (new executables) for contrast
    codec2 = RGBAFileCodec(CodecIO(rgb_model, p1024, kind="rgb"),
                           CodecIO(mask_model, mask_params, kind="mask"))
    e_fresh = measure(codec2, p1024, "fresh rgb_1024")
    print(f"VERDICT: swap {e_swap:.6f} vs fresh {e_fresh:.6f} -> "
          + ("SET_PARAMS-STALE" if e_swap > 10 * max(e_fresh, 1e-6)
             else "same behavior"), flush=True)
    print("DESYNC3_DONE", flush=True)


if __name__ == "__main__":
    main()
