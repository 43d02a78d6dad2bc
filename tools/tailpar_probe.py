"""On-chip proof + WARM timing ladder for the round-3 decode levers.

Drives the REAL bitstream path on the TPU at Kodak-like shape and checks:
  1. every (tail_parallel, interleave) variant decodes bit-identically to
     the serial chain on-chip (the fp32 stats recomputed in the tail
     program must match the per-slice programs' — same guarantee class
     as encode-vs-decode index agreement, asserted here on real hardware);
  2. the warm decode latency of the full lever matrix the levers were
     built for (VERDICT r3 item 3): tail_parallel on/off x interleave
     1/2/4, at batch 8 and 16.

Host wall clock IS the metric: the decode loop's cost is the
host<->device round trips (10 -> 6 with the parallel tail) plus host
rANS, not device FLOPs.  Each interleave size compiles its own slice
executables once — the first pass of each config is discarded as
compile, then 5 warm repeats are timed.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/tailpar_probe.py
Env: PROBE_BATCHES=8,16  PROBE_H/PROBE_W (default 256x384)  PROBE_REPS=5
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.eval.codec_io import CodecIO
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.ops.mask_pyramid import mask_pyramid

H = int(os.environ.get("PROBE_H", "256"))
W = int(os.environ.get("PROBE_W", "384"))
BATCHES = tuple(int(b) for b in
                os.environ.get("PROBE_BATCHES", "8,16").split(","))
REPS = int(os.environ.get("PROBE_REPS", "5"))


def _ts():
    return time.strftime("%H:%M:%S")


def decode(io, comp, mask, interleave, tail):
    return io.decompress_batch(comp, mask=mask, interleave=interleave,
                               tail_parallel=tail)


def main():
    print(jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    model = RGBCodec()
    from rgba_tpu.utils.init import cpu_init
    d0 = synthetic_rgba_batch(1, H, W, seed=3)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(d0["alpha"]))
    params = jax.device_put(cpu_init(
        model, {"params": rng, "noise": rng}, d0["masked_image"],
        d0["alpha"], d0["alpha"], me0, training=False)["params"])
    io = CodecIO(model, params, kind="rgb")

    results = []
    for batch in BATCHES:
        data = synthetic_rgba_batch(batch, H, W, seed=3)
        x = np.asarray(data["masked_image"])
        mask = np.asarray(data["alpha"])

        t0 = time.time()
        comp = io.compress_batch(image=x, mask=mask)
        print(f"[{_ts()}] batch {batch}: compress "
              f"{time.time() - t0:.1f}s (incl. compile)", flush=True)

        ref = None
        for tail in (False, True):
            for il in (1, 2, 4):
                # pass 1: compile + bit-identity check
                out = decode(io, comp, mask, il, tail)
                if ref is None:
                    ref = out
                else:
                    np.testing.assert_array_equal(out, ref)
                ts = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    decode(io, comp, mask, il, tail)
                    ts.append(time.perf_counter() - t0)
                row = {"batch": batch, "tail_parallel": tail,
                       "interleave": il,
                       "best_ms": round(min(ts) * 1e3, 1),
                       "median_ms": round(sorted(ts)[len(ts) // 2] * 1e3, 1),
                       "img_per_s": round(batch / min(ts), 2)}
                results.append(row)
                print(f"[{_ts()}] {json.dumps(row)}", flush=True)
        print(f"[{_ts()}] batch {batch}: all 6 variants BIT-IDENTICAL "
              "on chip", flush=True)

    print("LADDER " + json.dumps(results), flush=True)
    print("tailpar_probe OK", flush=True)


if __name__ == "__main__":
    main()
