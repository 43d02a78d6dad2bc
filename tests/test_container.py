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


def test_pack_unpack_crop_fields():
    rgb = {"strings": [b"\x01\x02", b"\x03"], "shape": (1, 1)}
    blob = pack_rgba(64, 64, rgb, None, crop=(512, 768, 128, 320))
    meta = unpack_rgba(blob)
    assert meta["crop"] == (512, 768, 128, 320)
    assert meta["height"] == 64 and meta["width"] == 64
    assert meta["consumed"] == len(blob)
    # uncropped blobs keep crop=None and the old byte layout
    plain = pack_rgba(64, 64, rgb, None)
    assert unpack_rgba(plain)["crop"] is None
    assert len(blob) == len(plain) + 16
    # truncation inside the crop fields is a clean ValueError
    for cut in range(len(blob)):
        try:
            unpack_rgba(blob[:cut])
        except ValueError:
            continue
        assert unpack_rgba(blob[:cut])["consumed"] <= cut


@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_rgba_file_codec_bbox_mode():
    """Alpha-bbox serving mode: encoding a canvas with bbox=True must emit
    the exact bitstream of directly encoding the tight crop (transparent
    borders cost zero bits and zero model FLOPs), and decode must place
    the reconstruction back into a transparent canvas at the recorded
    offset.  This is the reference's zero-window skip
    (masked_win_attention.py:35-47) taken to the container level."""
    import jax
    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec, unpack_rgba
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    d = synthetic_rgba_batch(1, 64, 64, seed=11)
    content_img = d["image"]
    content_a = np.clip(d["alpha"], 0.25, 1.0)  # every content pixel visible

    # place the 64x64 content at (32, 32) inside a 128x128 transparent canvas
    img = np.zeros((1, 128, 128, 3), np.float32)
    alpha = np.zeros((1, 128, 128, 1), np.float32)
    img[:, 32:96, 32:96] = content_img
    alpha[:, 32:96, 32:96] = content_a

    mask_model, rgb_model = MaskCodec(), RGBCodec()
    m = jnp.asarray(content_a)
    mask_params = mask_model.init({"params": key, "noise": key}, m,
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key},
                                jnp.asarray(content_img), m, m,
                                mask_pyramid(m), training=False)["params"]
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))

    blob_bbox = codec.encode(img, alpha, bbox=True)
    meta = unpack_rgba(blob_bbox)
    assert meta["crop"] == (128, 128, 32, 32)
    assert (meta["height"], meta["width"]) == (64, 64)

    # oracle: bit-identical to encoding the tight crop directly
    blob_direct = codec.encode(content_img, content_a)
    direct = unpack_rgba(blob_direct)
    assert meta["rgb"]["strings"] == direct["rgb"]["strings"]
    assert meta["mask"]["strings"] == direct["mask"]["strings"]
    # and far smaller than coding the full canvas
    blob_full = codec.encode(img, alpha)
    assert len(blob_bbox) < len(blob_full)

    rgba = codec.decode(blob_bbox)
    assert rgba.shape == (1, 128, 128, 4)
    inner = codec.decode(blob_direct)
    np.testing.assert_allclose(rgba[:, 32:96, 32:96], inner, atol=1e-6)
    outside = np.ones((1, 128, 128, 1), bool)
    outside[:, 32:96, 32:96] = False
    np.testing.assert_array_equal(rgba[outside[..., 0]], 0.0)

    # uint8 output places into a uint8 canvas
    u8 = codec.decode_batch([blob_bbox], output="uint8")
    assert u8.dtype == np.uint8 and u8.shape == (1, 128, 128, 4)
    np.testing.assert_array_equal(u8[outside[..., 0]], 0)

    # rectangular opaque sprite: cropped alpha is all-ones -> the mask
    # stream disappears entirely (bbox turns "opaque" from a whole-image
    # property into a within-bbox property)
    alpha_rect = np.zeros_like(alpha)
    alpha_rect[:, 32:96, 32:96] = 1.0
    img_rect = np.where(alpha_rect > 0, img, 0.0)
    blob_rect = codec.encode(img_rect, alpha_rect, bbox=True)
    mr = unpack_rgba(blob_rect)
    assert mr["mask"] is None and mr["crop"] == (128, 128, 32, 32)
    rgba_rect = codec.decode(blob_rect)
    np.testing.assert_array_equal(rgba_rect[:, 32:96, 32:96, 3], 1.0)
    np.testing.assert_array_equal(rgba_rect[outside[..., 0]], 0.0)

    # degenerate cases fall back to uncropped coding
    assert unpack_rgba(codec.encode(content_img, content_a,
                                    bbox=True))["crop"] is None  # full bbox
    assert unpack_rgba(codec.encode(np.zeros_like(content_img),
                                    np.zeros_like(content_a),
                                    bbox=True))["crop"] is None  # empty bbox


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_rgba_file_codec_bbox_batch_union():
    """encode_batch(bbox=True) crops to the UNION bbox of the batch (one
    shape -> one set of compiled executables); every image decodes into
    the same canvas with content at its own position inside the union."""
    import jax
    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import synthetic_rgba_batch
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec, unpack_rgba
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    d = synthetic_rgba_batch(2, 64, 64, seed=23)
    content_a = np.clip(d["alpha"], 0.25, 1.0)
    img = np.zeros((2, 192, 192, 3), np.float32)
    alpha = np.zeros((2, 192, 192, 1), np.float32)
    offs = [(16, 32), (64, 96)]          # different placements per image
    for i, (oy, ox) in enumerate(offs):
        img[i, oy:oy + 64, ox:ox + 64] = d["image"][i]
        alpha[i, oy:oy + 64, ox:ox + 64] = content_a[i]
    # union bbox: rows 16..127, cols 32..159 -> crop 112x128 at (16, 32)

    mask_model, rgb_model = MaskCodec(), RGBCodec()
    m = jnp.asarray(content_a[:1])
    mask_params = mask_model.init({"params": key, "noise": key}, m,
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key},
                                jnp.asarray(d["image"][:1]), m, m,
                                mask_pyramid(m), training=False)["params"]
    codec = RGBAFileCodec(CodecIO(rgb_model, rgb_params, kind="rgb"),
                          CodecIO(mask_model, mask_params, kind="mask"))

    blobs = codec.encode_batch(img, alpha, bbox=True)
    metas = [unpack_rgba(b) for b in blobs]
    assert all(m2["crop"] == (192, 192, 16, 32) for m2 in metas)
    assert all((m2["height"], m2["width"]) == (112, 128) for m2 in metas)

    # oracle: bit-identical to directly encoding the union crop (112x128,
    # which also exercises /64 transparent-padding UNDER the bbox crop)
    direct = codec.encode_batch(img[:, 16:128, 32:160],
                                alpha[:, 16:128, 32:160])
    for b_bbox, b_dir in zip(blobs, direct):
        mb, md = unpack_rgba(b_bbox), unpack_rgba(b_dir)
        assert mb["rgb"]["strings"] == md["rgb"]["strings"]
        assert (mb["mask"] is None) == (md["mask"] is None)
        if mb["mask"] is not None:
            assert mb["mask"]["strings"] == md["mask"]["strings"]

    rgba = codec.decode_batch(blobs)
    assert rgba.shape == (2, 192, 192, 4)
    inner = codec.decode_batch(direct)
    np.testing.assert_allclose(rgba[:, 16:128, 32:160], inner, atol=1e-6)
    for i in range(2):
        # everything outside the union bbox is exactly transparent
        out = np.ones((192, 192), bool)
        out[16:128, 32:160] = False
        np.testing.assert_array_equal(rgba[i][out], 0.0)


@pytest.mark.slow
@pytest.mark.skipif(not rans.available(), reason="native rans not built")
def test_decode_batch_chain_interleave_matches_serial():
    """decode_batch drives the mask codec's 5-slice chain and the RGB
    codec's 10-slice chains under ONE drive_chains loop (host rANS of one
    chain hides under the other's device dispatches).  Interleaving must
    be bit-identical to the serial order (mask decode fully, then RGB) —
    it only reorders when independent programs are enqueued — including
    with rate-gated streams and sub-batch interleave=2."""
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
    d = synthetic_rgba_batch(3, 64, 64, seed=11)
    mask = jnp.asarray(d["alpha"][:1])
    x = jnp.asarray(d["masked_image"][:1])
    mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                  training=False)["params"]
    rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                mask, mask_pyramid(mask),
                                training=False)["params"]
    rgb_io = CodecIO(rgb_model, rgb_params, kind="rgb")
    mask_io = CodecIO(mask_model, mask_params, kind="mask")
    codec = RGBAFileCodec(rgb_io, mask_io)

    for rate_gate in (False, True):
        blobs = codec.encode_batch(d["image"], d["alpha"],
                                   rate_gate=rate_gate)
        got = codec.decode_batch(blobs)
        got2 = codec.decode_batch(blobs, interleave=2)

        # serial oracle: the pre-interleave decode order, built from the
        # same public pieces (mask stream fully decoded first, then RGB)
        from rgba_tpu.eval.container import unpack_rgba
        from rgba_tpu.ops.morphology import constraint_rgb
        metas = [unpack_rgba(b) for b in blobs]
        rm = mask_io.decompress_batch([m["mask"] for m in metas],
                                      device=True)
        rm = jnp.round(jnp.clip(rm, 0, 1) * 255.0) / 255.0
        rm = constraint_rgb(rm)
        rgb = rgb_io.decompress_batch(
            [m["rgb"] for m in metas], mask=rm,
            rate_gate=rate_gate, device=True)
        h = metas[0]["height"]
        w = metas[0]["width"]
        oracle = np.asarray(jax.device_get(
            jnp.concatenate([rgb[:, :h, :w], rm[:, :h, :w]], -1)))
        np.testing.assert_array_equal(got, oracle)
        np.testing.assert_array_equal(got2, oracle)
