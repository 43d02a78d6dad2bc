"""On-chip probe: device-decoded lane streams vs the host-coder chain.

Measures, warm, at Kodak size (512x768, SERVE-free fp32 stats policy as
the codec requires):
  * encode_batch lanes32 vs v64 (bytes + wall time)
  * decode_batch lanes32 (device rANS, ~2 syncs) vs v64 chain (11 syncs)
    at batch 1 and batch 8
  * correctness: |lane recon - chain recon| <= 1.5/255 (different XLA
    programs; symbols are bit-identical by the CPU three-ended tests)

Round-5 target (VERDICT task 3): batch-1 decode < 1 s, batch-8 decode
> 9 img/s warm.  Run with PYTHONPATH=/root/.axon_site:/root/repo under
tools/watchdog.sh; one TPU client at a time (CLAUDE.md).
"""

import os
import time

import numpy as np

BATCHES = tuple(int(b) for b in
                os.environ.get("LANE_PROBE_BATCHES", "1,8").split(","))
H = int(os.environ.get("LANE_PROBE_H", "512"))
W = int(os.environ.get("LANE_PROBE_W", "768"))
ITERS = int(os.environ.get("LANE_PROBE_ITERS", "3"))


def main():
    import jax

    print(jax.devices(), flush=True)
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    from rgba_tpu.utils.init import cpu_init
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    d0 = synthetic_rgba_batch(1, H, W, seed=1)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(d0["alpha"]))
    t0 = time.time()
    mp = cpu_init(mask_model, {"params": key, "noise": key}, d0["alpha"],
                  training=False)["params"]
    rp = cpu_init(rgb_model, {"params": key, "noise": key},
                  d0["masked_image"], d0["alpha"], d0["alpha"], me0,
                  training=False)["params"]
    print(f"cpu_init {time.time() - t0:.0f}s", flush=True)
    codec = RGBAFileCodec(CodecIO(rgb_model, rp, kind="rgb"),
                          CodecIO(mask_model, mp, kind="mask"))

    for B in BATCHES:
        datas = [synthetic_rgba_batch(B, H, W, seed=10 + s)
                 for s in range(max(2, ITERS))]

        # ---- warm both paths (compiles; also correctness probe)
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
        print(f"[B={B}] warm decode v64 {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        r32 = codec.decode_batch(b32)
        print(f"[B={B}] warm decode lanes32 {time.time() - t0:.0f}s",
              flush=True)
        err = float(np.abs(r32 - r64).max())
        print(f"[B={B}] |lane - chain| max = {err:.6f}", flush=True)
        assert err <= 1.5 / 255.0, err

        # ---- warm timing: encode once per iter (distinct data), decode
        def run(tag, fn, blobs_list):
            times = []
            for blobs in blobs_list:
                t0 = time.perf_counter()
                out = fn(blobs)
                out.sum()  # host-side already
                times.append(time.perf_counter() - t0)
            best, med = min(times), sorted(times)[len(times) // 2]
            print(f"[B={B}] {tag}: best {best * 1e3:.1f} ms  med "
                  f"{med * 1e3:.1f} ms  ({B / best:.2f} img/s best)",
                  flush=True)
            return times

        encs64, encs32 = [], []
        for it in range(ITERS):
            encs64.append(codec.encode_batch(
                datas[it % len(datas)]["image"],
                datas[it % len(datas)]["alpha"]))
            encs32.append(codec.encode_batch(
                datas[it % len(datas)]["image"],
                datas[it % len(datas)]["alpha"], stream_format="lanes32"))
        run("decode v64  ", lambda b: codec.decode_batch(b), encs64)
        run("decode lanes", lambda b: codec.decode_batch(b), encs32)

        # encode timing (both formats share the device pass; lanes adds
        # the per-lane host coder)
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
            # host lane coder: same bytes, pays the ~30 MB symbol fetch
            codec.encode_batch(datas[0]["image"], datas[0]["alpha"],
                               stream_format="lanes32")  # warm host path
            enc("encode lanes (host)  ", stream_format="lanes32")
        finally:
            os.environ["RGBA_TPU_DEVICE_ENCODE"] = "1"

    print("LANE_DECODE_PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
