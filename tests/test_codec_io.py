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
