"""On-chip proof + timing for the tail-parallel decode.

Drives the REAL bitstream path on the TPU at Kodak-like shape and checks:
  1. tail_parallel decode is bit-identical to the serial chain on-chip
     (the fp32 stats recomputed in the tail program must match the
     per-slice programs' — same guarantee class as encode-vs-decode
     index agreement, asserted here on real hardware);
  2. the warm decode latency saved by cutting 10 round trips to 6.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/tailpar_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.eval.codec_io import CodecIO
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.ops.mask_pyramid import mask_pyramid

BATCH = int(__import__("os").environ.get("PROBE_BATCH", "4"))
H, W = 256, 384


def main():
    print(jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    model = RGBCodec()
    data = synthetic_rgba_batch(BATCH, H, W, seed=3)
    x = jnp.asarray(data["masked_image"])
    mask = jnp.asarray(data["alpha"])
    from rgba_tpu.utils.init import cpu_init
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(data["alpha"][:1]))
    params = jax.device_put(cpu_init(
        model, {"params": rng, "noise": rng}, data["masked_image"][:1],
        data["alpha"][:1], data["alpha"][:1], me0,
        training=False)["params"])
    io = CodecIO(model, params, kind="rgb")

    t0 = time.time()
    comp = io.compress_batch(image=np.asarray(x), mask=np.asarray(mask))
    print(f"compress (incl. compile): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    a = io.decompress_batch(comp, mask=np.asarray(mask), tail_parallel=True)
    print(f"tail decode (incl. compile): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    b = io.decompress_batch(comp, mask=np.asarray(mask), tail_parallel=False)
    print(f"serial decode (incl. compile): {time.time() - t0:.1f}s",
          flush=True)
    np.testing.assert_array_equal(a, b)
    print("BIT-IDENTICAL on chip", flush=True)

    # warm timing: host wall clock IS the metric (the decode loop's cost
    # is the host<->device round trips, not device FLOPs)
    for name, tp in (("tail", True), ("serial", False)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            io.decompress_batch(comp, mask=np.asarray(mask),
                                tail_parallel=tp)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: warm decode {min(ts) * 1000:.1f} ms "
              f"(median {sorted(ts)[len(ts) // 2] * 1000:.1f})", flush=True)
    print("tailpar_probe OK", flush=True)


if __name__ == "__main__":
    main()
