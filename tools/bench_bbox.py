"""Alpha-bbox serving benchmark on the real TPU.

Sprite-style RGBA workloads (product shots, portraits, game assets) put
content in a fraction of a transparent canvas.  The reference pays full
FLOPs + bits for the whole canvas (its zero-window skip only drops
attention windows, masked_win_attention.py:35-47); our --bbox container
mode crops to the alpha bounding box before coding, so transparent
borders cost nothing in ANY stage.

This measures full encode+decode throughput of a 768x512 canvas whose
content is a 384x256 window (1/4 of the pixels), bbox off vs on.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
       python -u tools/bench_bbox.py [batch] [iters]
"""

import sys
import time

import numpy as np


def sprite_batch(batch, ch, cw, h, w, y0, x0, seed):
    """Canvas (ch, cw) with synthetic RGBA content in a (h, w) window."""
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    d = synthetic_rgba_batch(batch, h, w, seed=seed)
    img = np.zeros((batch, ch, cw, 3), np.float32)
    alpha = np.zeros((batch, ch, cw, 1), np.float32)
    # content alpha floor 0.1 so the bbox is exactly the content window
    img[:, y0:y0 + h, x0:x0 + w] = d["image"]
    alpha[:, y0:y0 + h, x0:x0 + w] = np.clip(d["alpha"], 0.1, 1.0)
    u8 = {"image": np.round(img * 255).astype(np.uint8),
          "alpha": np.round(alpha * 255).astype(np.uint8)}
    return u8


def main():
    import jax
    import jax.numpy as jnp
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec, unpack_rgba
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ch, cw = 512, 768          # canvas: full Kodak geometry
    h, w, y0, x0 = 256, 384, 128, 192   # content: 1/4 of the pixels
    print("devices:", jax.devices(), flush=True)

    rng = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    datas = [sprite_batch(batch, ch, cw, h, w, y0, x0, seed=s)
             for s in range(max(iters, 2))]
    from rgba_tpu.utils.init import cpu_init
    m0 = np.zeros((1, 64, 64, 1), np.float32)
    x0_ = np.zeros((1, 64, 64, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(m0))
    mask_params = jax.device_put(cpu_init(
        mask_model, {"params": rng, "noise": rng}, m0,
        training=False)["params"])
    rgb_params = jax.device_put(cpu_init(
        rgb_model, {"params": rng, "noise": rng}, x0_, m0, m0, me0,
        training=False)["params"])
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))

    for bbox in (False, True):
        # warm-up compiles + correctness probe
        blobs = codec.encode_batch(datas[0]["image"], datas[0]["alpha"],
                                   bbox=bbox)
        meta = unpack_rgba(blobs[0])
        assert (meta["crop"] == (ch, cw, y0, x0)) == bbox, meta["crop"]
        rgba = codec.decode_batch(blobs, output="uint8")
        assert rgba.shape == (batch, ch, cw, 4)
        nbytes = sum(len(b) for b in blobs)

        t0 = time.perf_counter()
        for i in range(iters):
            blobs = codec.encode_batch(datas[i]["image"], datas[i]["alpha"],
                                       bbox=bbox)
            rgba = codec.decode_batch(blobs, output="uint8")
        rgba.sum()
        dt = time.perf_counter() - t0
        print(f"bbox={bbox}: {batch * iters / dt:6.2f} img/s  "
              f"({dt / (iters * batch) * 1e3:6.1f} ms/img, "
              f"{nbytes * 8 / (batch * ch * cw):.4f} bpp-canvas)", flush=True)


if __name__ == "__main__":
    main()
