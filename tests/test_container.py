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
