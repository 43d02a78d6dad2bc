"""RGBA file codec CLI — encode a PNG to a compressed blob and back.

    python -m rgba_tpu.cli.codec encode in.png out.rgbc \
        -r checkpoints/rgb/iter_1500000.ckpt -m checkpoints/mask/iter_600000.ckpt
    python -m rgba_tpu.cli.codec decode out.rgbc recon.png -r ... -m ...

Weights may also be reference .pth.tar files (auto-detected and imported).
Images are padded to multiples of 64 (the codec's downsampling factor,
SURVEY §7.3) and cropped back on decode.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _load_codecs(rgb_path: str, mask_path: str):
    import jax
    import jax.numpy as jnp
    from ..eval.codec_io import CodecIO
    from ..eval.container import RGBAFileCodec
    from ..models.mask_codec import MaskCodec
    from ..models.rgb_codec import RGBCodec
    from ..ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    mask_model = MaskCodec()
    m = jnp.zeros((1, 64, 64, 1))
    mask_params = mask_model.init({"params": key, "noise": key}, m,
                                  training=False)["params"]
    rgb_model = RGBCodec()
    x = jnp.zeros((1, 64, 64, 3))
    rgb_params = rgb_model.init({"params": key, "noise": key}, x, m, m,
                                mask_pyramid(m), training=False)["params"]

    def load(path, template, kind):
        if not path:
            return template
        if path.endswith((".pth.tar", ".pth", ".pt")):
            from ..train.torch_import import convert_state_dict, load_pth_tar
            return convert_state_dict(load_pth_tar(path),
                                      jax.device_get(template), kind=kind)
        from ..train.checkpoint import load_checkpoint
        return load_checkpoint(jax.device_get(template), path)

    rgb_params = load(rgb_path, rgb_params, "rgb")
    mask_params = load(mask_path, mask_params, "mask")
    return RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                         CodecIO(mask_model, mask_params, kind="mask"))


def _pad64(arr):
    h, w = arr.shape[1:3]
    ph, pw = (-h) % 64, (-w) % 64
    if ph or pw:
        arr = np.pad(arr, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return arr, (h, w)


def main(argv=None):
    p = argparse.ArgumentParser(description="rgba_tpu file codec")
    p.add_argument("command", choices=["encode", "decode"])
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-r", "--rgb-model", default="", help="RGB codec weights")
    p.add_argument("-m", "--mask-model", default="", help="mask codec weights")
    args = p.parse_args(argv)

    from PIL import Image
    codec = _load_codecs(args.rgb_model, args.mask_model)

    if args.command == "encode":
        img = Image.open(args.input).convert("RGBA")
        arr = np.asarray(img, np.float32)[None] / 255.0
        rgb, alpha = arr[..., :3], arr[..., 3:4]
        rgb, (h, w) = _pad64(rgb)
        alpha, _ = _pad64(alpha)
        blob = codec.encode(rgb, alpha)
        # remember the crop in a trailer
        blob += h.to_bytes(4, "little") + w.to_bytes(4, "little")
        with open(args.output, "wb") as f:
            f.write(blob)
        raw = os.path.getsize(args.input)
        print(f"{args.input} -> {args.output}: {len(blob)} bytes "
              f"({len(blob) * 8 / (h * w):.4f} bpp, {raw / len(blob):.1f}x "
              f"vs source file)")
    else:
        with open(args.input, "rb") as f:
            blob = f.read()
        h = int.from_bytes(blob[-8:-4], "little")
        w = int.from_bytes(blob[-4:], "little")
        rgba = codec.decode(blob[:-8])[0, :h, :w]
        Image.fromarray((np.clip(rgba, 0, 1) * 255).astype(np.uint8),
                        "RGBA").save(args.output)
        print(f"{args.input} -> {args.output} ({w}x{h})")


if __name__ == "__main__":
    main()
