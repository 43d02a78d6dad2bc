"""Cross-batch pipelined serving must be bit-identical to the serial loop."""

import numpy as np
import pytest

from rgba_tpu.native import rans


def _build_codec(key_seed=0):
    import jax
    import jax.numpy as jnp
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(key_seed)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    mask = jnp.zeros((1, 64, 64, 1))
    x = jnp.zeros((1, 64, 64, 3))
    me = mask_pyramid(mask)
    mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                mask, me, training=False)["params"]
    return RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                         CodecIO(mask_model, mask_params, kind="mask"))


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_pipelined_codec_matches_serial():
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.pipeline import PipelinedCodec

    codec = _build_codec()
    pipe = PipelinedCodec(codec, depth=2)

    batches = []
    for s in range(3):
        d = synthetic_rgba_batch(2, 64, 64, seed=10 + s)
        batches.append((d["image"], d["alpha"]))

    # serial oracle
    serial_blobs = [codec.encode_batch(*b) for b in batches]
    serial_rgba = [codec.decode_batch(bl) for bl in serial_blobs]

    # pipelined encode: identical bitstreams, in order
    piped_blobs = list(pipe.encode_stream(iter(batches)))
    assert piped_blobs == serial_blobs

    # pipelined decode: identical reconstructions, in order
    for got, want in zip(pipe.decode_stream(iter(serial_blobs)), serial_rgba):
        np.testing.assert_array_equal(got, want)

    # full round-trip stream (the serving loop shape)
    for (blobs, rgba), want_b, want_r in zip(
            pipe.roundtrip_stream(iter(batches)), serial_blobs, serial_rgba):
        assert blobs == want_b
        np.testing.assert_array_equal(rgba, want_r)
    pipe.close()


def test_pipeline_ordering_and_depth():
    """The pipeline yields results in submission order even when later
    items finish first, and never holds more than `depth` in flight."""
    import threading
    import time

    from rgba_tpu.eval.pipeline import PipelinedCodec

    class FakeCodec:
        def __init__(self):
            self.in_flight = 0
            self.max_in_flight = 0
            self.lock = threading.Lock()

        def encode_batch(self, item, _alpha=None):
            with self.lock:
                self.in_flight += 1
                self.max_in_flight = max(self.max_in_flight, self.in_flight)
            # first item is the slowest — later ones would overtake it
            time.sleep(0.05 if item == 0 else 0.005)
            with self.lock:
                self.in_flight -= 1
            return [bytes([item])]

    fake = FakeCodec()
    pipe = PipelinedCodec(fake, depth=2)
    out = list(pipe.encode_stream((i, None) for i in range(6)))
    assert out == [[bytes([i])] for i in range(6)]
    assert fake.max_in_flight <= 2
    pipe.close()


def test_pipeline_empty_and_single():
    from rgba_tpu.eval.pipeline import PipelinedCodec

    class Echo:
        def encode_batch(self, x, _a=None):
            return [x]

    pipe = PipelinedCodec(Echo(), depth=2)
    assert list(pipe.encode_stream(iter([]))) == []
    assert list(pipe.encode_stream(iter([("a", None)]))) == [["a"]]
    pipe.close()
