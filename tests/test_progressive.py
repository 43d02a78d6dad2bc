"""Progressive (slice-scalable) decode: decode only the first k of the
channel-AR latent slices from ONE encoded stream and mean-fill the rest.

The channel-AR chain (AutoEncoderRGB_Journal.py:237-264) is causal, so:
  * max_slices=num_slices must reproduce the full decode bit-exactly, and
  * the first k slices of a k-preview's y_hat must be bit-identical to
    the full decode's first k slices (only the mean-filled tail differs).
This capability has no reference analog — the reference always decodes
all 10 slices (AutoEncoderRGB_Journal.py:390-410).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.eval.codec_io import CodecIO
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.native import rans

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not rans.available(),
                                 reason="native rans not built")]

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mask_io():
    # the mask codec (5 slices) exercises the identical prior machinery at
    # half the compile cost of the RGB codec's 10
    model = MaskCodec()
    data = synthetic_rgba_batch(2, 64, 64, seed=3)
    mask = jnp.asarray(data["alpha"])
    params = model.init({"params": KEY, "noise": KEY}, mask[:1],
                        training=False)["params"]
    io = CodecIO(model, params, kind="mask")
    comps = io.compress_batch(mask=np.asarray(mask))
    return io, comps


def test_full_max_slices_equals_full_decode(mask_io):
    io, comps = mask_io
    full = io.decompress_batch(comps)
    capped = io.decompress_batch(comps, max_slices=io.num_slices)
    np.testing.assert_array_equal(capped, full)


def test_preview_prefix_is_bit_identical(mask_io):
    io, comps = mask_io
    _, y_full = io.decompress_batch_with_latent(comps)
    sw = y_full.shape[-1] // io.num_slices
    for k in (0, 1, 3):
        x_k, y_k = io.decompress_batch_with_latent(comps, max_slices=k)
        assert y_k.shape == y_full.shape
        assert x_k.shape[0] == y_full.shape[0]
        # causality: decoded slices agree exactly with the full decode
        np.testing.assert_array_equal(y_k[..., :k * sw],
                                      y_full[..., :k * sw])
        # the mean-filled tail is NOT the coded tail (random weights make
        # exact-zero residuals vanishingly unlikely across a whole slice)
        assert not np.array_equal(y_k[..., k * sw:], y_full[..., k * sw:])


def test_zero_slice_preview_reads_no_y_bytes(mask_io):
    """max_slices=0 is a pure hyperprior reconstruction: the y stream is
    never touched, so a blob whose y section is EMPTY must still decode —
    the strongest form of the 'previews skip the tail's rANS work' claim."""
    io, comps = mask_io
    _, want = io.decompress_batch_with_latent(comps, max_slices=0)
    gutted = [{"strings": [b"", c["strings"][1]], "shape": c["shape"]}
              for c in comps]
    _, got = io.decompress_batch_with_latent(gutted, max_slices=0)
    np.testing.assert_array_equal(got, want)


def test_preview_composes_with_rate_gate():
    """Progressive preview of a RATE-GATED stream: the decoded prefix must
    still be bit-identical to the full gated decode (gated cells decode to
    mu+lrp — exactly what the mean-fill tail produces, so the two
    mechanisms share one reconstruction rule)."""
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    d = synthetic_rgba_batch(1, 64, 64, seed=5)
    # x40: random-init weights give near-zero-entropy latents from [0,1]
    # inputs — scale up so symbols carry real bits (test_rate_gate.py:84)
    x = jnp.asarray(d["masked_image"] * 40.0)
    mask = jnp.asarray(d["alpha"])
    me = mask_pyramid(mask)
    assert float(np.mean(np.asarray(me[2]) == 0.0)) > 0.05
    model = RGBCodec()
    params = model.init({"params": KEY, "noise": KEY}, x, mask, mask, me,
                        training=True)["params"]
    io = CodecIO(model, params, kind="rgb", rate_gate=True)

    comps = io.compress_batch(image=np.asarray(x), mask=np.asarray(mask))
    _, y_full = io.decompress_batch_with_latent(comps,
                                                mask=np.asarray(mask))
    _, y_k = io.decompress_batch_with_latent(comps, mask=np.asarray(mask),
                                             max_slices=3)
    sw = y_full.shape[-1] // io.num_slices
    np.testing.assert_array_equal(y_k[..., :3 * sw], y_full[..., :3 * sw])
    assert not np.array_equal(y_k[..., 3 * sw:], y_full[..., 3 * sw:])


def test_container_progressive_decode():
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    data = synthetic_rgba_batch(1, 64, 64, seed=5)
    x = jnp.asarray(data["masked_image"])
    mask = jnp.asarray(data["alpha"])
    me = mask_pyramid(mask)
    rgb_model = RGBCodec()
    rgb_params = rgb_model.init({"params": KEY, "noise": KEY}, x, mask,
                                mask, me, training=False)["params"]
    mask_model = MaskCodec()
    mask_params = mask_model.init({"params": KEY, "noise": KEY}, mask,
                                  training=False)["params"]
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))
    blob = codec.encode(np.asarray(x), np.asarray(mask))

    full = codec.decode(blob)
    again = codec.decode(blob, max_slices=10)
    np.testing.assert_array_equal(again, full)

    preview = codec.decode(blob, max_slices=3)
    assert preview.shape == full.shape
    # alpha channel comes from the (always fully decoded) mask stream
    np.testing.assert_array_equal(preview[..., 3], full[..., 3])
    # (pixel-level divergence is NOT asserted: a random-init decoder
    # saturates under the [0,1] clip; the latent-level causality tests
    # above pin where preview and full decode must and must not agree)
