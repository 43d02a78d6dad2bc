"""Round-5 combined chip session: set_params swap check + lane ladder.

One process, one backend init, one cpu_init — the per-process startup
tax under the tunnel (~15 min first-op stall + init) makes separate
probes uneconomical.  Runs, in order:

1. desync_probe3's set_params swap check (fresh rgb_256 -> swap to
   rgb_1024 -> fresh rgb_1024) on tree image 0.
2. The lane-format warm ladder at Kodak size on the TRAINED rgb_4096 +
   mask checkpoints (realistic rates): encode/decode v64 vs lanes32 at
   batches 1 and 8, correctness cross-checks (VERDICT r4 task 3:
   batch-1 decode < 1 s, batch-8 decode > 9 img/s).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u \
    tools/r5_combo_probe.py --outdir /root/repo/.rd_sweep
"""

import argparse
import os
import time

import numpy as np

BATCHES = tuple(int(b) for b in
                os.environ.get("LANE_PROBE_BATCHES", "1,8").split(","))
ITERS = int(os.environ.get("LANE_PROBE_ITERS", "3"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/root/repo/.rd_sweep")
    ap.add_argument("--skip-swap-check", action="store_true")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    print(jax.devices(), flush=True)
    from rgba_tpu.data.datasets import KodakDataset
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
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

    # ---------------- part 1: set_params swap check ----------------
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

    p1024 = rgb_of("rgb_1024")
    p4096 = rgb_of("rgb_4096")
    if not args.skip_swap_check:
        p256 = rgb_of("rgb_256")
        codec = RGBAFileCodec(CodecIO(rgb_model, p256, kind="rgb"),
                              CodecIO(mask_model, mask_params, kind="mask"))
        measure(codec, p256, "fresh rgb_256")
        codec.rgb_io.set_params(p1024)
        codec.mask_io.set_params(mask_params)
        e_swap = measure(codec, p1024, "after set_params -> rgb_1024")
        codec.rgb_io.set_params(p4096)
        codec.mask_io.set_params(mask_params)
        measure(codec, p4096, "after set_params -> rgb_4096")
        codec2 = RGBAFileCodec(
            CodecIO(rgb_model, p1024, kind="rgb"),
            CodecIO(mask_model, mask_params, kind="mask"))
        e_fresh = measure(codec2, p1024, "fresh rgb_1024")
        print(f"SWAP_VERDICT: swap {e_swap:.6f} vs fresh {e_fresh:.6f} -> "
              + ("SET_PARAMS-STALE" if e_swap > 10 * max(e_fresh, 1e-6)
                 else "same behavior"), flush=True)

    # ---------------- part 2: lane ladder on trained weights --------
    codec = RGBAFileCodec(CodecIO(rgb_model, p4096, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))
    H, W = 512, 768
    for B in BATCHES:
        datas = [synthetic_rgba_batch(B, H, W, seed=30 + s)
                 for s in range(max(2, ITERS))]
        t0 = time.time()
        b64 = codec.encode_batch(datas[0]["image"], datas[0]["alpha"])
        print(f"[B={B}] warm encode v64 {time.time() - t0:.0f}s "
              f"{sum(map(len, b64))} B", flush=True)
        t0 = time.time()
        b32 = codec.encode_batch(datas[0]["image"], datas[0]["alpha"],
                                 stream_format="lanes32")
        print(f"[B={B}] warm encode lanes32 {time.time() - t0:.0f}s "
              f"{sum(map(len, b32))} B "
              f"(+{(sum(map(len, b32)) / sum(map(len, b64)) - 1) * 100:.2f}%)",
              flush=True)
        t0 = time.time()
        r64 = codec.decode_batch(b64)
        print(f"[B={B}] warm decode v64 {time.time() - t0:.0f}s",
              flush=True)
        t0 = time.time()
        r32 = codec.decode_batch(b32)
        print(f"[B={B}] warm decode lanes32 {time.time() - t0:.0f}s",
              flush=True)
        err = float(np.abs(r32 - r64).max())
        print(f"[B={B}] |lane - chain| max = {err:.6f}", flush=True)

        def run(tag, fn, blobs_list):
            times = []
            for blobs in blobs_list:
                t0 = time.perf_counter()
                out = fn(blobs)
                out.sum()
                times.append(time.perf_counter() - t0)
            best, med = min(times), sorted(times)[len(times) // 2]
            print(f"[B={B}] {tag}: best {best * 1e3:.1f} ms  med "
                  f"{med * 1e3:.1f} ms  ({B / best:.2f} img/s best)",
                  flush=True)

        encs64, encs32 = [], []
        for it in range(ITERS):
            dd = datas[it % len(datas)]
            encs64.append(codec.encode_batch(dd["image"], dd["alpha"]))
            encs32.append(codec.encode_batch(dd["image"], dd["alpha"],
                                             stream_format="lanes32"))
        run("decode v64  ", lambda b: codec.decode_batch(b), encs64)
        run("decode lanes", lambda b: codec.decode_batch(b), encs32)

        def enc(tag, **kw):
            times = []
            for it in range(ITERS):
                dd = datas[it % len(datas)]
                t0 = time.perf_counter()
                codec.encode_batch(dd["image"], dd["alpha"], **kw)
                times.append(time.perf_counter() - t0)
            print(f"[B={B}] {tag}: best {min(times) * 1e3:.1f} ms "
                  f"({B / min(times):.2f} img/s)", flush=True)

        enc("encode v64  ")
        enc("encode lanes (device)", stream_format="lanes32")
        os.environ["RGBA_TPU_DEVICE_ENCODE"] = "0"
        try:
            codec.encode_batch(datas[0]["image"], datas[0]["alpha"],
                               stream_format="lanes32")
            enc("encode lanes (host)  ", stream_format="lanes32")
        finally:
            os.environ["RGBA_TPU_DEVICE_ENCODE"] = "1"

    print("R5_COMBO_PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
