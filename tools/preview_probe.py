"""Progressive-preview ladder on the real TPU: decode latency (and, when
trained RD-sweep checkpoints are present, masked PSNR) vs decoded slice
count k, from ONE encoded blob.

The decode cost model: k slices decoded = k host<->device round trips +
k rANS slice decodes + ONE fused mean-fill dispatch for the tail, vs the
full decode's num_slices round trips.  Under the axon tunnel each round
trip pays ~26 ms of sync, so the ladder is steep here; on a PCIe host
the same ladder is paced by the rANS work instead.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
       python -u tools/preview_probe.py [lam=4096]
(latency-only with random init when /tmp/rd_sweep checkpoints are absent)
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
from rgba_tpu.ops.mask_pyramid import mask_pyramid
from tools.rate_gate_codec_probe import masked_psnr


def _random_params():
    from rgba_tpu.utils.init import cpu_init

    key = jax.random.PRNGKey(0)
    m0 = np.zeros((1, 256, 256, 1), np.float32)
    x0 = np.zeros((1, 256, 256, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(m0))
    return {
        "mask_codec": cpu_init(
            MaskCodec(), {"params": key, "noise": key}, m0,
            training=False)["params"],
        "rgb_codec": cpu_init(
            RGBCodec(), {"params": key, "noise": key}, x0, m0, m0, me0,
            training=False)["params"],
    }


def main():
    lam = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(jax.devices(), flush=True)
    trained = False
    try:
        from tools.int8_quality_probe import load_trained_params
        params = load_trained_params(lam)
        trained = True
    except SystemExit:
        print("no trained checkpoints — latency-only (random init)",
              flush=True)
        params = _random_params()
    params = jax.device_put(params)
    codec = RGBAFileCodec(
        CodecIO(RGBCodec(), params["rgb_codec"], kind="rgb"),
        CodecIO(MaskCodec(), params["mask_codec"], kind="mask"))

    batch, h, w = 8, 512, 768
    d = synthetic_rgba_batch(batch, h, w, seed=1)
    image, alpha = d["image"], d["alpha"]
    npix = batch * h * w

    blobs = codec.encode_batch(image, alpha)
    bpp = sum(len(b) for b in blobs) * 8 / npix
    print(json.dumps({"lam": lam if trained else None, "bpp": round(bpp, 5),
                      "batch": batch}), flush=True)

    ks = (10, 6, 3, 1, 0)
    # warm-up: compile every k's decode variant before timing any
    for k in ks:
        codec.decode_batch(blobs, max_slices=k)

    ladder = []
    full = None
    for k in ks:
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            rgba = codec.decode_batch(blobs, max_slices=k)
        dt = (time.perf_counter() - t0) / reps
        if k == 10:
            full = rgba
        point = {"k": k, "decode_s_per_image": round(dt / batch, 4),
                 "images_per_sec": round(batch / dt, 3)}
        if trained:
            point["masked_psnr_db"] = round(
                masked_psnr(image, rgba[..., :3], alpha), 3)
        ladder.append(point)
        print(json.dumps(point), flush=True)

    # k=10 must be the full decode bit-exactly
    np.testing.assert_array_equal(full, codec.decode_batch(blobs))
    assert ladder[-1]["decode_s_per_image"] < ladder[0]["decode_s_per_image"]
    print(json.dumps({"preview_ladder": ladder}), flush=True)
    print("preview_probe OK", flush=True)


if __name__ == "__main__":
    main()
