"""Phase-level timing of the real codec path (encode/decode breakdown).

python -u tools/profile_codec.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.eval.codec_io import CodecIO
from rgba_tpu.eval.container import RGBAFileCodec
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.ops.mask_pyramid import mask_pyramid


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w = 512, 768
    print(jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    data = synthetic_rgba_batch(batch, h, w, seed=0)
    from rgba_tpu.utils.init import cpu_init
    m0 = data["alpha"][:1]
    x0 = data["masked_image"][:1]
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me = mask_pyramid(jnp.asarray(m0))
    t0 = time.time()
    mask_params = jax.device_put(cpu_init(
        mask_model, {"params": rng, "noise": rng}, m0,
        training=False)["params"])
    rgb_params = jax.device_put(cpu_init(
        rgb_model, {"params": rng, "noise": rng}, x0, m0, m0, me,
        training=False)["params"])
    print(f"init {time.time() - t0:.1f}s", flush=True)
    rgb_io = CodecIO(rgb_model, rgb_params, kind="rgb")
    mask_io = CodecIO(mask_model, mask_params, kind="mask")
    codec = RGBAFileCodec(rgb_io, mask_io)

    # warm-up (compiles)
    t0 = time.time()
    blobs = codec.encode_batch(data["image"], data["alpha"])
    print(f"encode warm-up {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    rgba = codec.decode_batch(blobs)
    print(f"decode warm-up {time.time() - t0:.1f}s", flush=True)
    assert np.isfinite(rgba).all()

    # --- phase timing on steady state
    for it in range(2):
        t0 = time.time()
        comp_m = mask_io.compress_batch(mask=data["alpha"])
        t1 = time.time()
        rm = mask_io.decompress_batch(comp_m)
        t2 = time.time()
        rm = np.round(np.clip(rm, 0, 1) * 255.0) / 255.0
        from rgba_tpu.ops.morphology import constraint_rgb
        rm = np.asarray(constraint_rgb(jnp.asarray(rm)))
        masked = np.where(rm > 0, data["image"], rm)
        t3 = time.time()
        comp_r = rgb_io.compress_batch(image=masked, mask=rm)
        t4 = time.time()
        out = rgb_io.decompress_batch(comp_r, mask=rm)
        t5 = time.time()
        print(f"iter{it}: mask_enc {t1 - t0:.2f}s mask_dec {t2 - t1:.2f}s "
              f"constraint {t3 - t2:.2f}s rgb_enc {t4 - t3:.2f}s "
              f"rgb_dec {t5 - t4:.2f}s total {t5 - t0:.2f}s "
              f"({batch / (t5 - t0):.2f} img/s)", flush=True)

    # fine-grained: decode-loop step cost for the RGB stream
    lm_probe = []
    t0 = time.time()
    comp = comp_r
    zh, zw = comp[0]["shape"]
    t = rgb_io.eb_tables
    c = t["quantized_cdfs"].shape[0]
    z_indexes = np.broadcast_to(np.arange(c, dtype=np.int32), (1, zh, zw, c))
    from rgba_tpu.native import rans as rans_mod
    z_sym = np.concatenate([rans_mod.decode_with_indexes(
        comp[b]["strings"][1], z_indexes, t["quantized_cdfs"],
        t["cdf_lengths"], t["offsets"]).astype(np.float32)
        for b in range(batch)])
    t1 = time.time()
    z_hat = jnp.asarray(z_sym + t["medians"][None, None, None, :])
    lm, ls = rgb_io._hyper_decode_fn(rgb_io.params, z_hat)
    decoders = [rans_mod.RansDecoder(c2["strings"][0]) for c2 in comp]
    mu, index = rgb_io._first_stats_fn(rgb_io.params, lm, ls)
    jax.device_get(index)
    t2 = time.time()
    y_hats = []
    t_fetch = t_rans = t_step = 0.0
    for i in range(rgb_io.num_slices):
        ta = time.time()
        idx_np = jax.device_get(index).astype(np.int32)
        tb = time.time()
        syms = list(rgb_io._pool.map(
            lambda a: a[0].decode_stream(a[1], rgb_io.gc.quantized_cdfs,
                                         rgb_io.gc.cdf_lengths,
                                         rgb_io.gc.offsets),
            [(decoders[b], idx_np[b:b + 1]) for b in range(batch)]))
        tc = time.time()
        sym_dev = jnp.asarray(np.concatenate(syms).astype(np.int16))
        if i < rgb_io.num_slices - 1:
            y_prev, mu, index = rgb_io._step_fns[i + 1](
                rgb_io.params, lm, ls, sym_dev, mu, *y_hats)
            y_hats.append(y_prev)
        else:
            y_hats.append(rgb_io._last_finish_fn(
                rgb_io.params, lm, sym_dev, mu, *y_hats))
        td = time.time()
        t_fetch += tb - ta
        t_rans += tc - tb
        t_step += td - tc
    print(f"rgb stream: z_rans {t1 - t0:.2f}s hyper+first {t2 - t1:.2f}s | "
          f"slice loop: fetch {t_fetch:.2f}s rans {t_rans:.2f}s "
          f"step-dispatch {t_step:.2f}s", flush=True)


if __name__ == "__main__":
    main()
