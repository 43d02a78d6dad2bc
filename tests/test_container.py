import numpy as np
import pytest

from rgba_tpu.eval.container import pack_rgba, unpack_rgba
from rgba_tpu.native import rans


def test_pack_unpack_roundtrip():
    rgb = {"strings": [b"\x01\x02\x03", b"\x04\x05"], "shape": (8, 12)}
    mask = {"strings": [b"\xaa" * 10, b"\xbb"], "shape": (8, 12)}
    blob = pack_rgba(512, 768, rgb, mask)
    meta = unpack_rgba(blob)
    assert meta["height"] == 512 and meta["width"] == 768
    assert meta["rgb"]["strings"] == rgb["strings"]
    assert meta["rgb"]["shape"] == (8, 12)
    assert meta["mask"]["strings"] == mask["strings"]


def test_pack_unpack_opaque():
    rgb = {"strings": [b"xy", b"z"], "shape": (4, 6)}
    blob = pack_rgba(256, 384, rgb, None)
    meta = unpack_rgba(blob)
    assert meta["mask"] is None
    assert meta["rgb"]["strings"] == [b"xy", b"z"]


def test_bad_magic():
    with pytest.raises(ValueError):
        unpack_rgba(b"NOPE" + b"\x00" * 40)


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_rgba_file_codec_end_to_end():
    """Encode an RGBA image to one blob, decode, verify the RGB part is the
    forward-quantized reconstruction gated by the decoded mask."""
    import jax
    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    d = synthetic_rgba_batch(1, 64, 64, seed=3)
    image, alpha = d["image"], d["alpha"]

    mask_model = MaskCodec()
    mask_params = mask_model.init({"params": key, "noise": key},
                                  jnp.asarray(alpha), training=False)["params"]
    rgb_model = RGBCodec()
    me = mask_pyramid(jnp.asarray(alpha))
    rgb_params = rgb_model.init({"params": key, "noise": key},
                                jnp.asarray(image), jnp.asarray(alpha),
                                jnp.asarray(alpha), me,
                                training=False)["params"]

    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))
    blob = codec.encode(image, alpha)
    assert isinstance(blob, bytes) and len(blob) > 20
    rgba = codec.decode(blob)
    assert rgba.shape == (1, 64, 64, 4)
    assert np.isfinite(rgba).all()
    assert (rgba >= 0).all() and (rgba <= 1).all()

    # opaque alpha skips the mask stream entirely
    ones = np.ones_like(alpha)
    blob2 = codec.encode(image, ones)
    rgba2 = codec.decode(blob2)
    np.testing.assert_array_equal(rgba2[..., 3], 1.0)
    assert len(blob2) < len(blob) + 64   # no mask stream bytes


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_rgba_file_codec_batched():
    """Batched serving path: encode_batch/decode_batch must agree with the
    per-image path bit-for-bit (the per-slice device round trip is paid
    once per slice for the whole batch), including decoding a blob from a
    batched encode individually (cross-batch-size determinism of the
    stats convs is load-bearing for the format)."""
    import jax
    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    d = synthetic_rgba_batch(3, 64, 64, seed=7)
    # image 1 opaque: exercises the per-image mask-stream flag in a batch
    d["alpha"][1] = 1.0
    d["masked_image"][1] = d["image"][1]
    mask = jnp.asarray(d["alpha"][:1])
    x = jnp.asarray(d["masked_image"][:1])
    me = mask_pyramid(mask)
    mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                mask, me, training=False)["params"]
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))

    blobs = codec.encode_batch(d["image"], d["alpha"])
    assert len(blobs) == 3
    rgba = codec.decode_batch(blobs)
    assert rgba.shape == (3, 64, 64, 4)
    np.testing.assert_array_equal(rgba[1, ..., 3], 1.0)

    # per-image encode produces identical bitstreams...
    for i in range(3):
        blob1 = codec.encode(d["image"][i:i + 1], d["alpha"][i:i + 1])
        assert blob1 == blobs[i], f"batched vs single encode differ (im {i})"
    # ...and per-image decode reproduces the batched reconstruction
    for i in range(3):
        one = codec.decode(blobs[i])
        np.testing.assert_allclose(one[0], rgba[i], atol=1e-6)


@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_rgba_file_codec_uint8_edges():
    """8-bit serving contract: uint8 inputs produce the same bitstream as
    their float(q/255) equivalents, and output="uint8" returns exactly the
    rounded float reconstruction (conversions happen on-device)."""
    import jax
    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    d = synthetic_rgba_batch(2, 64, 64, seed=3)
    img_u8 = np.round(d["image"] * 255.0).astype(np.uint8)
    a_u8 = np.round(d["alpha"] * 255.0).astype(np.uint8)
    img_f = img_u8.astype(np.float32) / 255.0
    a_f = a_u8.astype(np.float32) / 255.0
    mask = jnp.asarray(a_f[:1])
    x = jnp.asarray(img_f[:1] * (a_f[:1] > 0))
    me = mask_pyramid(mask)
    mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                mask, me, training=False)["params"]
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))

    blobs_u8 = codec.encode_batch(img_u8, a_u8)
    blobs_f = codec.encode_batch(img_f, a_f)
    assert blobs_u8 == blobs_f

    out_f = codec.decode_batch(blobs_u8)
    out_u8 = codec.decode_batch(blobs_u8, output="uint8")
    assert out_u8.dtype == np.uint8
    np.testing.assert_array_equal(out_u8,
                                  np.round(out_f * 255.0).astype(np.uint8))


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_rgba_file_codec_arbitrary_resolution():
    """Non-/64 sizes are transparent-padded to the model grid on encode and
    cropped back on decode (SURVEY §7.3 pad/crop; the reference hard-fails
    on such inputs). Opaque members still ship no mask stream — the
    decoder rebuilds the ones-inside pattern from the header dims."""
    import jax
    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    d = synthetic_rgba_batch(2, 96, 120, seed=5)
    d["alpha"][1] = 1.0   # one opaque member
    mask = jnp.zeros((1, 64, 64, 1))
    x = jnp.zeros((1, 64, 64, 3))
    me = mask_pyramid(mask)
    mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                mask, me, training=False)["params"]
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))

    blobs = codec.encode_batch(d["image"], d["alpha"])
    rgba = codec.decode_batch(blobs)
    assert rgba.shape == (2, 96, 120, 4)
    assert np.isfinite(rgba).all()
    # opaque member decodes to all-ones alpha after the crop
    np.testing.assert_array_equal(rgba[1, ..., 3], 1.0)
    # per-image decode matches the batched decode
    one = codec.decode(blobs[0])
    np.testing.assert_allclose(one[0], rgba[0], atol=1e-6)
    # uint8 output path crops identically
    u8 = codec.decode_batch(blobs, output="uint8")
    assert u8.shape == (2, 96, 120, 4)
    np.testing.assert_array_equal(
        u8, np.round(rgba * 255.0).astype(np.uint8))


def test_unpack_rejects_corrupt_blob():
    from rgba_tpu.eval.container import pack_rgba, unpack_rgba
    with pytest.raises(ValueError):
        unpack_rgba(b"NOPE" + b"\x00" * 32)
    blob = pack_rgba(64, 64, {"shape": (1, 1),
                              "strings": [b"abc", b"de"]}, None)
    meta = unpack_rgba(blob)
    assert meta["height"] == 64 and meta["mask"] is None
    assert meta["rgb"]["strings"] == [b"abc", b"de"]


def test_unpack_rejects_truncated_blobs():
    """Every truncation point raises ValueError — never struct.error or
    IndexError (the CLI and any network-facing caller rely on this)."""
    rgb = {"strings": [b"abcdef", b"gh"], "shape": (4, 6)}
    mask = {"strings": [b"ij", b"k"], "shape": (2, 3)}
    blob = pack_rgba(100, 200, rgb, mask)
    meta = unpack_rgba(blob)
    assert meta["consumed"] == len(blob)
    for cut in range(len(blob)):
        try:
            unpack_rgba(blob[:cut])
        except ValueError:
            continue
        # a prefix that still parses must at least consume <= cut
        assert unpack_rgba(blob[:cut])["consumed"] <= cut
