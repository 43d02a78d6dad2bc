"""Pinpoint a real-bitstream decode divergence (codec_err >> 1/255).

The v64 decode chain recomputes each slice's (mu, sigma) in a
differently-fused program than the one-pass encoder; indexes must agree
bit-exactly or the rANS stream desyncs (codec_io.py header).  The
round-5 sweep's rgb_1024 point recorded codec_err 0.407 — this probe
isolates WHERE: for each slice it compares, against the encoder's own
tensors,
  (a) the decoder's index array (stats mismatch -> index flip), and
  (b) the decoded symbols (stream desync propagates from the first
      mismatched index),
then repeats with the lane-format device decode for the same blob
content, and with tail_parallel off.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u \
    tools/desync_probe.py --outdir /root/repo/.rd_sweep --name rgb_1024
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/root/repo/.rd_sweep")
    ap.add_argument("--name", default="rgb_1024")
    ap.add_argument("--hw", default="512x768")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (deterministic repro "
                    "attempt without the chip)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    print(jax.devices(), flush=True)
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    from rgba_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from rgba_tpu.utils.init import cpu_init

    h, w = (int(v) for v in args.hw.split("x"))
    key = jax.random.PRNGKey(0)
    d = synthetic_rgba_batch(1, h, w, seed=77)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(d["alpha"]))
    t0 = time.time()
    mask_tmpl = cpu_init(mask_model, {"params": key, "noise": key},
                         d["alpha"], training=False)["params"]
    rgb_tmpl = cpu_init(rgb_model, {"params": key, "noise": key},
                        d["masked_image"], d["alpha"], d["alpha"], me0,
                        training=False)["params"]
    print(f"cpu_init {time.time() - t0:.0f}s", flush=True)
    mask_params = load_checkpoint(
        jax.device_get(mask_tmpl),
        latest_checkpoint(f"{args.outdir}/mask_ck"))
    rgb_params = load_checkpoint(
        jax.device_get(rgb_tmpl),
        latest_checkpoint(f"{args.outdir}/{args.name}_ck"))
    rgb_io = CodecIO(rgb_model, rgb_params, kind="rgb")
    mask_io = CodecIO(mask_model, mask_params, kind="mask")

    # container semantics: mask recon -> 8-bit round -> constraint -> gate
    from rgba_tpu.ops.morphology import constraint_rgb
    mcomp = mask_io.compress_batch(mask=d["alpha"])
    rm = mask_io.decompress_batch(mcomp, device=True)
    rm = jax.jit(lambda r: constraint_rgb(
        jnp.round(jnp.clip(r, 0, 1) * 255.0) / 255.0))(rm)
    masked = jax.jit(lambda x, m: jnp.where(m > 0, x, m))(
        jnp.asarray(d["image"]), rm)

    # ---- encoder's own tensors (the oracle)
    me = mask_pyramid(rm)
    enc_args = (masked, rm, me[1], me[2])
    syms_d, idxs_d, z_d, _ = rgb_io._compress_fn(rgb_io._fp.flat, *enc_args)
    enc_syms = np.asarray(jax.device_get(syms_d)).astype(np.int32)
    enc_idxs = np.asarray(jax.device_get(idxs_d)).astype(np.int32)
    print(f"encoder: {enc_syms.shape} symbols, idx range "
          f"{enc_idxs.min()}..{enc_idxs.max()}", flush=True)

    comp = rgb_io.compress_batch(image=masked, mask=rm)

    # ---- manual decode chain, comparing per slice
    from rgba_tpu.native import rans
    t = rgb_io.eb_tables
    zh, zw = comp[0]["shape"]
    c = t["quantized_cdfs"].shape[0]
    z_indexes = np.broadcast_to(np.arange(c, dtype=np.int32),
                                (1, zh, zw, c))
    z_sym = rans.decode_with_indexes(
        comp[0]["strings"][1], z_indexes, t["quantized_cdfs"],
        t["cdf_lengths"], t["offsets"]).astype(np.float32)
    z_enc = np.asarray(jax.device_get(z_d)).astype(np.float32)
    print(f"z stream: decoded == encoded: "
          f"{np.array_equal(z_sym.ravel(), z_enc.ravel())}", flush=True)
    z_hat = jnp.asarray(z_sym + t["medians"][None, None, None, :])
    lm, ls = rgb_io._hyper_decode_fn(rgb_io._fp.flat, z_hat)

    dec = rans.RansDecoder(comp[0]["strings"][0])
    mu, index = rgb_io._first_stats_fn(rgb_io._fp.flat, lm, ls)
    y_hats = []
    first_bad = None
    for i in range(rgb_io.num_slices):
        idx_np = np.asarray(jax.device_get(index)).astype(np.int32)
        idx_diff = int((idx_np != enc_idxs[i]).sum())
        sym = dec.decode_stream(idx_np.ravel(), rgb_io.gc.quantized_cdfs,
                                rgb_io.gc.cdf_lengths, rgb_io.gc.offsets)
        sym = sym.reshape(idx_np.shape)
        sym_diff = int((sym != enc_syms[i]).sum())
        print(f"slice {i}: idx mismatches {idx_diff}, "
              f"sym mismatches {sym_diff}", flush=True)
        if (idx_diff or sym_diff) and first_bad is None:
            first_bad = i
            bad = np.argwhere(idx_np != enc_idxs[i])[:5]
            for b in bad:
                print(f"  idx@{tuple(b)}: dec {idx_np[tuple(b)]} "
                      f"enc {enc_idxs[i][tuple(b)]}", flush=True)
        sym_dev = jnp.asarray(sym.astype(np.int16))
        if i + 1 < rgb_io.num_slices:
            y_prev, mu, index = rgb_io._step_fns[i + 1](
                rgb_io._fp.flat, lm, ls, sym_dev, mu, *y_hats)
            y_hats.append(y_prev)
        else:
            y_hats.append(rgb_io._last_finish_fn(
                rgb_io._fp.flat, lm, sym_dev, mu, *y_hats))
    dec.close()
    print(f"first divergent slice: {first_bad}", flush=True)

    # ---- lane-format path on the same content
    comp32 = rgb_io.compress_batch(image=masked, mask=rm,
                                   stream_format="lanes32")
    _, y32 = rgb_io.decompress_device(comp32, mask=rm,
                                      _return_latent=True)
    y64 = jnp.concatenate(y_hats, axis=-1)
    lane_err = float(jnp.max(jnp.abs(y32 - y64)))
    print(f"lane y_hat vs chain y_hat: max {lane_err:.6f}", flush=True)
    print("DESYNC_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
