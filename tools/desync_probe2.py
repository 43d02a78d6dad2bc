"""Reproduce the sweep eval's codec_err for one model, per image.

desync_probe.py showed the serial chain clean at rgb_1024 on fresh
synthetic content; this mirrors evaluate_kodak's exact container path
(same .rd_sweep/kodak images, batch-1 encode/decode, codec_forward
oracle) and prints |decode - forward| per image for: the default decode,
tail_parallel=False, and the lane-format device decode — isolating
content vs decode-path as the trigger for the 0.407 codec_err.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u \
    tools/desync_probe2.py --outdir /root/repo/.rd_sweep --name rgb_1024
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/root/repo/.rd_sweep")
    ap.add_argument("--name", default="rgb_1024")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    print(jax.devices(), flush=True)
    from rgba_tpu.data.datasets import KodakDataset
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec, unpack_rgba
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
    rgb_params = load_checkpoint(
        rgb_tmpl, latest_checkpoint(f"{args.outdir}/{args.name}_ck"))
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))
    codec_forward = _make_codec_forward(rgb_model)

    ds = KodakDataset(f"{args.outdir}/kodak")
    for i in range(len(ds)):
        item = ds.get(i)
        blob = codec.encode(item["image"][None], item["alpha"][None])
        meta = unpack_rgba(blob)

        def err_of(rgba):
            rm = rgba[..., 3:]
            masked = np.where(rm > 0, item["image"][None], rm)
            x_fwd = jax.device_get(codec_forward(
                rgb_params, jnp.asarray(masked), jnp.asarray(rm)))
            return float(np.abs(rgba[..., :3] - x_fwd).max())

        rgba = codec.decode(blob)
        e_def = err_of(rgba)
        # serial (no tail-parallel) decode of the same rgb stream,
        # against the same decoded alpha
        rm = rgba[..., 3:]
        y_ser = codec.rgb_io.decompress_batch(
            [meta["rgb"]], mask=rm, device=True, tail_parallel=False)
        rgba_ser = np.concatenate(
            [np.asarray(jax.device_get(y_ser)), rm], axis=-1)
        e_ser = err_of(rgba_ser)
        print(f"img {i}: err default {e_def:.6f}  serial {e_ser:.6f}",
              flush=True)

        if e_def > 1.5 / 255:
            # which slice? progressive decodes are bit-identical up to k
            for k in (0, 2, 4, 5, 6, 8, 10):
                rk = codec.decode(blob, max_slices=k)
                print(f"  k={k}: err {err_of(rk):.6f}", flush=True)

    # lane-format container on image 0 (device encode + device decode)
    item = ds.get(0)
    blob32 = codec.encode(item["image"][None], item["alpha"][None],
                          stream_format="lanes32")
    r32 = codec.decode(blob32)
    rgba0 = codec.decode(codec.encode(item["image"][None],
                                      item["alpha"][None]))
    print(f"lane vs v64 decode: max |diff| "
          f"{float(np.abs(r32 - rgba0).max()):.6f}", flush=True)
    print("DESYNC2_DONE", flush=True)


if __name__ == "__main__":
    main()
