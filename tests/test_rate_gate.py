"""Alpha-rate gating tests (RGBCodec.rate_gate / ChannelARPrior gate).

The gate pins RGB latent cells whose /8 recon-alpha pool is exactly zero
to y_hat = mu (+lrp) and removes their bits from the estimate — the
forward analog of the real codec skipping those symbols.  Invariants:

  * fully-opaque alpha => gate is all-ones => BIT-IDENTICAL outputs;
  * blob alpha => strictly lower bpp, finite outputs, and the visible-
    pixel MSE must not change more than quantization noise;
  * training path ignores the flag (gradients/noise untouched).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.ops.mask_pyramid import mask_pyramid

KEY = jax.random.PRNGKey(0)
H = W = 128


def _setup(opaque):
    d = synthetic_rgba_batch(2, H, W, seed=3, opaque=opaque)
    x = jnp.asarray(d["masked_image"])
    mask = jnp.asarray(d["alpha"])
    me = mask_pyramid(mask)
    model = RGBCodec()
    params = model.init({"params": KEY, "noise": KEY}, x, mask, mask, me,
                        training=True)
    return params, x, mask, me


def test_opaque_alpha_gate_is_identity():
    params, x, mask, me = _setup(opaque=True)
    out0 = RGBCodec(rate_gate=False).apply(params, x, mask, mask, me,
                                           training=False)
    out1 = RGBCodec(rate_gate=True).apply(params, x, mask, mask, me,
                                          training=False)
    np.testing.assert_array_equal(np.asarray(out0["x_hat"]),
                                  np.asarray(out1["x_hat"]))
    np.testing.assert_array_equal(np.asarray(out0["bpp"]),
                                  np.asarray(out1["bpp"]))


def test_blob_alpha_gate_saves_rate_keeps_visible_pixels():
    params, x, mask, me = _setup(opaque=False)
    share = float(np.mean(np.asarray(mask_pyramid(mask)[2]) == 0.0))
    assert share > 0.05, "fixture must contain fully-transparent regions"

    out0 = RGBCodec(rate_gate=False).apply(params, x, mask, mask, me,
                                           training=False)
    out1 = RGBCodec(rate_gate=True).apply(params, x, mask, mask, me,
                                          training=False)
    assert float(out1["bpp"]) < float(out0["bpp"])
    assert np.isfinite(np.asarray(out1["x_hat"])).all()
    # visible-region distortion unchanged within noise (random-init model:
    # loose bound; the trained-weights probe pins the real number)
    m0, m1 = float(out0["mse_loss"]), float(out1["mse_loss"])
    assert abs(m1 - m0) < 0.1 * max(m0, 1e-6)


def _rgb_io(x, mask, me, rate_gate=False):
    from rgba_tpu.eval.codec_io import CodecIO
    model = RGBCodec()
    params = model.init({"params": KEY, "noise": KEY}, x, mask, mask, me,
                        training=True)["params"]
    return CodecIO(model, params, kind="rgb", rate_gate=rate_gate)


def test_codec_rate_gate_stream_consistency():
    """The gated bitstream must decode to EXACTLY the reconstruction of an
    ungated stream carrying the same (gate-zeroed) symbols — pins the
    host-side filter/scatter against rANS desync."""
    from rgba_tpu.native import rans
    import pytest
    if not rans.available():
        pytest.skip("native rans not built")

    d = synthetic_rgba_batch(1, 64, 64, seed=5)
    # x40: random-init weights produce near-zero-entropy latents from
    # [0,1] inputs (8-byte streams) — scale up so symbols carry real bits
    x = jnp.asarray(d["masked_image"] * 40.0)
    mask = jnp.asarray(d["alpha"])
    me = mask_pyramid(mask)
    io = _rgb_io(x, mask, me)

    share = float(np.mean(np.asarray(mask_pyramid(mask)[2]) == 0.0))
    assert share > 0.05, "fixture needs gated cells"

    comp_g = io.compress_batch(image=np.asarray(x), mask=np.asarray(mask),
                               rate_gate=True)
    comp_u = io.compress_batch(image=np.asarray(x), mask=np.asarray(mask),
                               rate_gate=False)
    assert len(comp_g[0]["strings"][0]) < len(comp_u[0]["strings"][0])

    # oracle stream: same gated symbols, but every position coded
    gate_dev = jnp.asarray(np.asarray(jax.device_get(me[2])) > 0)
    # the jitted passes take params as ONE flat buffer (utils/flatparams.py)
    syms, idxs, z_sym, z_shape = jax.device_get(io._compress_fn_gated(
        io._fp.flat, gate_dev, x, mask, me[1], me[2]))
    y_full = rans.encode_with_indexes(
        syms[:, 0].astype(np.int32).ravel(),
        idxs[:, 0].astype(np.int32).ravel(),
        io.gc.quantized_cdfs, io.gc.cdf_lengths, io.gc.offsets)
    oracle = [{"strings": [y_full, comp_g[0]["strings"][1]],
               "shape": comp_g[0]["shape"]}]

    x_gated = io.decompress_batch(comp_g, mask=np.asarray(mask),
                                  rate_gate=True)
    x_oracle = io.decompress_batch(oracle, mask=np.asarray(mask),
                                   rate_gate=False)
    np.testing.assert_array_equal(x_gated, x_oracle)


def test_container_rate_gate_flag_and_bytes():
    from rgba_tpu.native import rans
    import pytest
    if not rans.available():
        pytest.skip("native rans not built")
    from rgba_tpu.eval.codec_io import CodecIO
    from rgba_tpu.eval.container import RGBAFileCodec, unpack_rgba
    from rgba_tpu.models.mask_codec import MaskCodec

    d = synthetic_rgba_batch(1, 64, 64, seed=5)
    x, alpha = d["image"] * 40.0, d["alpha"]   # see x40 note above
    me = mask_pyramid(jnp.asarray(alpha))
    rgb_io = _rgb_io(jnp.asarray(x), jnp.asarray(alpha), me)
    mask_model = MaskCodec()
    mask_params = mask_model.init({"params": KEY, "noise": KEY},
                                  jnp.asarray(alpha),
                                  training=False)["params"]
    codec = RGBAFileCodec(rgb_io, CodecIO(mask_model, mask_params,
                                          kind="mask"))

    blob_u = codec.encode(x, alpha)
    blob_g = codec.encode(x, alpha, rate_gate=True)
    assert not unpack_rgba(blob_u)["rate_gated"]
    meta_g = unpack_rgba(blob_g)
    assert meta_g["rate_gated"]
    # the encoder's exact gate bitmap ships in the container (v2, 5th
    # section) — the decoder never re-derives it
    zh, zw = meta_g["rgb"]["shape"]
    assert meta_g["rgb"]["gate"].shape == (zh * 8, zw * 8, 1)
    assert meta_g["rgb"]["gate"].dtype == bool
    # the gate sees the RECON alpha; a random-init mask codec reconstructs
    # nowhere-zero alpha, so no cells gate here and the gated blob pays
    # only the small shipped-gate section — strict byte saving is pinned
    # at the CodecIO level (test_codec_rate_gate_stream_consistency)
    assert len(blob_g) <= len(blob_u) + 64

    rgba = codec.decode(blob_g)
    assert rgba.shape == (1, 64, 64, 4)
    assert np.isfinite(rgba).all()
    assert (rgba >= 0).all() and (rgba <= 1).all()

    # fully-opaque alpha: gate is all-ones — identical RGB stream bytes
    ones = np.ones_like(alpha)
    b_u = unpack_rgba(codec.encode(x, ones))
    b_g = unpack_rgba(codec.encode(x, ones, rate_gate=True))
    assert b_u["rgb"]["strings"][0] == b_g["rgb"]["strings"][0]
    assert b_u["rgb"]["strings"][1] == b_g["rgb"]["strings"][1]


def test_codec_deadzone_rate_control():
    """deadzone>0 must monotonically shed bytes while decoding to a recon
    that degrades GRACEFULLY from the dz=0 recon — an AR desync (encoder
    stats diverging from decoder stats) would blow the small-dz recon up,
    not perturb it."""
    from rgba_tpu.native import rans
    import pytest
    if not rans.available():
        pytest.skip("native rans not built")

    d = synthetic_rgba_batch(1, 64, 64, seed=5)
    x = jnp.asarray(d["masked_image"] * 40.0)
    mask = jnp.asarray(d["alpha"])
    me = mask_pyramid(mask)
    io = _rgb_io(x, mask, me)

    comps, recons, sizes = {}, {}, {}
    for dz in (0.0, 0.05, 0.6):
        c = io.compress_batch(image=np.asarray(x), mask=np.asarray(mask),
                              deadzone=dz)
        comps[dz] = c
        sizes[dz] = len(c[0]["strings"][0])
        recons[dz] = io.decompress_batch(c, mask=np.asarray(mask))
        assert np.isfinite(recons[dz]).all()
    assert sizes[0.6] < sizes[0.05] <= sizes[0.0]

    d_small = float(np.abs(recons[0.05] - recons[0.0]).mean())
    d_large = float(np.abs(recons[0.6] - recons[0.0]).mean())
    assert d_small < d_large
    assert d_small < 0.05   # tiny deadzone ~= plain quantizer

    # deterministic: same dz, same bytes
    again = io.compress_batch(image=np.asarray(x), mask=np.asarray(mask),
                              deadzone=0.6)
    assert again[0]["strings"][0] == comps[0.6][0]["strings"][0]


def test_training_ignores_rate_gate():
    params, x, mask, me = _setup(opaque=False)
    kw = dict(training=True, rngs={"noise": jax.random.PRNGKey(7)})
    out0 = RGBCodec(rate_gate=False).apply(params, x, mask, mask, me, **kw)
    out1 = RGBCodec(rate_gate=True).apply(params, x, mask, mask, me, **kw)
    np.testing.assert_array_equal(np.asarray(out0["bpp"]),
                                  np.asarray(out1["bpp"]))
