"""Deadzone RD curve on trained weights: runtime rate control, one model.

Encodes the same Kodak-shaped batch through the real container at several
deadzone widths (dz is a traced scalar — ONE compiled executable serves
the whole sweep) and reports byte-accurate bpp + masked PSNR per point.
The reference needs a separately-trained model per rate point
(examples/*.json λ sweep); this knob moves along the RD curve at serving
time with streams that remain decoder-compatible.

Usage: python -u tools/deadzone_probe.py [lam=4096]
"""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.eval.codec_io import CodecIO
from rgba_tpu.eval.container import RGBAFileCodec
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from tools.int8_quality_probe import load_trained_params
from tools.rate_gate_codec_probe import masked_psnr


def main():
    lam = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(jax.devices(), flush=True)
    params = load_trained_params(lam)
    codec = RGBAFileCodec(
        CodecIO(RGBCodec(), params["rgb_codec"], kind="rgb"),
        CodecIO(MaskCodec(), params["mask_codec"], kind="mask"))

    batch, h, w = 8, 512, 768
    d = synthetic_rgba_batch(batch, h, w, seed=1)
    image, alpha = d["image"], d["alpha"]
    npix = batch * h * w

    curve = []
    for dz in (0.0, 0.1, 0.2, 0.3, 0.5):
        blobs = codec.encode_batch(image, alpha, deadzone=dz)
        rgba = codec.decode_batch(blobs)
        point = {"dz": dz,
                 "bpp": round(sum(len(b) for b in blobs) * 8 / npix, 5),
                 "psnr_db": round(
                     masked_psnr(image, rgba[..., :3], alpha), 4)}
        curve.append(point)
        print(json.dumps(point), flush=True)

    bpps = [p["bpp"] for p in curve]
    assert all(b2 <= b1 for b1, b2 in zip(bpps, bpps[1:])), bpps
    print(json.dumps({"lam": lam, "deadzone_curve": curve}), flush=True)
    print("deadzone_probe OK", flush=True)


if __name__ == "__main__":
    main()
