"""Real-bitstream round trip: decompress(compress(x)) must reproduce the
forward-quantized reconstruction (the acceptance test of SURVEY §7.2-6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.eval.codec_io import CodecIO
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.native import rans
from rgba_tpu.ops.mask_pyramid import mask_pyramid

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not rans.available(),
                                 reason="native rans not built")]

KEY = jax.random.PRNGKey(0)


def test_mask_codec_bitstream_roundtrip():
    model = MaskCodec()
    data = synthetic_rgba_batch(1, 64, 64, seed=1)
    mask = jnp.asarray(data["alpha"])
    params = model.init({"params": KEY, "noise": KEY}, mask,
                        training=False)["params"]

    io = CodecIO(model, params, kind="mask")
    comp = io.compress(mask=np.asarray(mask))
    assert len(comp["strings"][0]) > 0 and len(comp["strings"][1]) > 0
    assert comp["shape"] == (1, 1)     # 64/64 = 1
    recon = io.decompress(comp)

    fwd = model.apply({"params": params}, mask, training=False)
    expect = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    np.testing.assert_allclose(recon, expect, atol=1e-5)

    # sanity: actual bytes roughly match the estimated bpp
    est_bits = float(fwd["bpp"]) * 64 * 64
    actual_bits = (len(comp["strings"][0]) + len(comp["strings"][1])) * 8
    assert actual_bits < est_bits * 1.5 + 512


def test_rgb_codec_bitstream_roundtrip():
    model = RGBCodec()
    data = synthetic_rgba_batch(1, 64, 64, seed=2)
    x = jnp.asarray(data["masked_image"])
    mask = jnp.asarray(data["alpha"])
    me = mask_pyramid(mask)
    params = model.init({"params": KEY, "noise": KEY}, x, mask, mask, me,
                        training=False)["params"]

    io = CodecIO(model, params, kind="rgb")
    comp = io.compress(image=np.asarray(x), mask=np.asarray(mask))
    recon = io.decompress(comp, mask=np.asarray(mask))
    assert recon.shape == (1, 64, 64, 3)

    # reference decompress gates the decoder with the SAME mask given to
    # compress (AutoEncoderRGB_Journal.py:373-415); forward with
    # reconmask=mask reproduces the identical pipeline
    fwd = model.apply({"params": params}, x, mask, mask, me, training=False)
    expect = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    np.testing.assert_allclose(recon, expect, atol=1e-5)


def test_rgb_codec_bitstream_rectangular():
    """Non-square image: exercises the (h, w) crops in the slice stats and
    the rectangular mask pyramid (Kodak is 768x512)."""
    model = RGBCodec()
    data = synthetic_rgba_batch(1, 64, 128, seed=4)
    x = jnp.asarray(data["masked_image"])
    mask = jnp.asarray(data["alpha"])
    me = mask_pyramid(mask)
    params = model.init({"params": KEY, "noise": KEY}, x, mask, mask, me,
                        training=False)["params"]
    io = CodecIO(model, params, kind="rgb")
    comp = io.compress(image=np.asarray(x), mask=np.asarray(mask))
    recon = io.decompress(comp, mask=np.asarray(mask))
    fwd = model.apply({"params": params}, x, mask, mask, me, training=False)
    np.testing.assert_allclose(recon, np.clip(np.asarray(fwd["x_hat"]), 0, 1),
                               atol=1e-5)


def test_tail_parallel_decode_bit_identical():
    """Tail-parallel decode (one stats pass + one index fetch for slices
    >= max_support, possible because the channel-AR support truncates to
    the first 5 decoded slices — AutoEncoderRGB_Journal.py:245) must be
    BIT-identical to the serial per-slice chain: same streams, same
    symbols, same y_hat and x_hat — only the round-trip count changes
    (10 -> 6).  Covers plain, rate-gated, interleaved, and progressive
    (max_slices straddling the tail) decodes."""
    model = RGBCodec()
    data = synthetic_rgba_batch(2, 64, 128, seed=7)
    x = jnp.asarray(data["masked_image"])
    mask = jnp.asarray(data["alpha"])
    me = mask_pyramid(mask)
    params = model.init({"params": KEY, "noise": KEY}, x[:1], mask[:1],
                        mask[:1], mask_pyramid(mask[:1]),
                        training=False)["params"]
    io = CodecIO(model, params, kind="rgb")

    for rg in (False, True):
        comp = io.compress_batch(image=np.asarray(x), mask=np.asarray(mask),
                                 rate_gate=rg)
        for kw in ({}, {"interleave": 2}, {"max_slices": 7},
                   {"max_slices": 5}, {"max_slices": 3}):
            a, ya = io.decompress_batch_with_latent(
                comp, mask=np.asarray(mask), rate_gate=rg,
                tail_parallel=True, **kw)
            b, yb = io.decompress_batch_with_latent(
                comp, mask=np.asarray(mask), rate_gate=rg,
                tail_parallel=False, **kw)
            np.testing.assert_array_equal(ya, yb, err_msg=f"rg={rg} {kw}")
            np.testing.assert_array_equal(a, b, err_msg=f"rg={rg} {kw}")
