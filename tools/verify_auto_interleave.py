"""Round-4 verify drive: the auto-interleave decode default on real TPU.

decompress_chains(interleave=None) auto-picks 2 sub-chains for even
batches 4-8 (the measured round-4 ladder optimum, PERFORMANCE.md;
narrowed per ADVICE r4).
This drives the FULL container encode->decode on the chip at batch 4
and asserts the auto default is byte-identical to explicit
interleave=1 (serial) and interleave=2, and that the reconstruction is
finite, in range, and matches shapes.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(jax.devices(), flush=True)
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    from rgba_tpu.utils.init import cpu_init

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    B, H, W = 4, 128, 192
    d = synthetic_rgba_batch(B, H, W, seed=3)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(d["alpha"][:1]))
    t0 = time.time()
    mp = jax.device_put(cpu_init(
        mask_model, {"params": key, "noise": key}, d["alpha"][:1],
        training=False)["params"])
    rp = jax.device_put(cpu_init(
        rgb_model, {"params": key, "noise": key}, d["masked_image"][:1],
        d["alpha"][:1], d["alpha"][:1], me0, training=False)["params"])
    print(f"cpu_init {time.time() - t0:.0f}s", flush=True)

    codec = RGBAFileCodec(CodecIO(rgb_model, rp, kind="rgb"),
                          CodecIO(mask_model, mp, kind="mask"))
    t0 = time.time()
    blobs = codec.encode_batch(d["image"], d["alpha"])
    print(f"encode_batch({B}) {time.time() - t0:.0f}s "
          f"{[len(b) for b in blobs]} bytes", flush=True)

    t0 = time.time()
    auto = codec.decode_batch(blobs)            # default: auto -> 2
    print(f"decode auto {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    ser = codec.decode_batch(blobs, interleave=1)
    print(f"decode interleave=1 {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    two = codec.decode_batch(blobs, interleave=2)
    print(f"decode interleave=2 {time.time() - t0:.0f}s", flush=True)

    assert auto.shape == (B, H, W, 4) and auto.dtype == np.float32, \
        (auto.shape, auto.dtype)
    assert np.isfinite(auto).all()
    assert auto.min() >= 0.0 and auto.max() <= 1.0, (auto.min(), auto.max())
    np.testing.assert_array_equal(auto, two)   # default took the G=2 path
    np.testing.assert_array_equal(auto, ser)   # ... bit-identical to serial
    # batch-1 edge: decodes, finite, and close to the batch-4 result.
    # NOT asserted bit-identical: batch-1 and batch-4 slice executables
    # are DIFFERENT XLA programs and may legally reorder reductions
    # (ADVICE r4) — exact equality is only guaranteed within a batch
    # shape, which the asserts above pin.
    one = codec.decode_batch(blobs[:1])
    assert np.isfinite(one).all()
    err = np.abs(one - auto[:1]).max()
    assert err <= 1.5 / 255.0, f"batch-1 vs batch-4 decode diverged: {err}"
    print("VERIFY_AUTO_INTERLEAVE_OK", flush=True)


if __name__ == "__main__":
    main()
