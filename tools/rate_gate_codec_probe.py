"""Real-bitstream validation of alpha-rate gating on trained weights.

Runs the full container path (mask stream -> constraint -> RGB stream)
with and without --rate-gate semantics on RD-sweep-trained checkpoints,
on Kodak-shaped synthetic RGBA.  Reports byte-accurate bpp for both
modes, the PSNR of each against the source, and the recon delta between
modes — the real-rANS counterpart of tools/rate_gate_probe.py.

Usage: python -u tools/rate_gate_codec_probe.py [lam=4096]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.eval.codec_io import CodecIO
from rgba_tpu.eval.container import RGBAFileCodec
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from tools.int8_quality_probe import load_trained_params


def masked_psnr(x, x_hat, alpha):
    m = (alpha > 0).astype(np.float64)
    m3 = np.broadcast_to(m, x.shape)
    mse = float((((x - x_hat) * m3) ** 2).sum() / max(m3.sum(), 1.0))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


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

    out = {}
    for name, rg in (("plain", False), ("rate_gate", True)):
        t0 = time.perf_counter()
        blobs = codec.encode_batch(image, alpha, rate_gate=rg)
        rgba = codec.decode_batch(blobs)
        dt = time.perf_counter() - t0
        nbytes = sum(len(b) for b in blobs)
        out[name] = {
            "bpp": round(nbytes * 8 / npix, 5),
            "psnr_db": round(masked_psnr(image, rgba[..., :3], alpha), 4),
            "roundtrip_s": round(dt, 2),
            "rgba": rgba,
        }
        print(name, json.dumps({k: v for k, v in out[name].items()
                                if k != "rgba"}), flush=True)

    diff = np.abs(out["rate_gate"]["rgba"] - out["plain"]["rgba"])
    vis = (alpha > 0)
    print(json.dumps({
        "lam": lam,
        "real_rate_saving_pct": round(
            100 * (1 - out["rate_gate"]["bpp"] / out["plain"]["bpp"]), 2),
        "d_psnr_db": round(out["rate_gate"]["psnr_db"]
                           - out["plain"]["psnr_db"], 4),
        "max_visible_recon_delta": round(
            float((diff[..., :3] * vis).max()), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
