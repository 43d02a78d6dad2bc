"""Numerical forward parity against the ACTUAL reference torch modules.

These tests import /root/reference/layers + models (with tiny dependency
stubs, see ref_torch.py), randomly initialize the torch modules, export
their real state dicts through our torch_import mapping, and assert our
flax forwards match torch in fp32.  This pins exactly the places a wrong
layout convention would silently break checkpoint import: rel-pos bias
indexing, qkv head ordering (masked_win_attention.py:96-131), gate wiring
(Masked_Attention.py:182-189), GDN reparameterization (GDN.py:64-90), and
the Sequential-index arithmetic of the prior heads
(AutoEncoderRGB_Journal.py:135-198).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rgba_tpu.ops.attention import MaskedWinBlock, WinGateAttention
from rgba_tpu.ops.gdn import GDN as JGDN
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.ops.mask_pyramid import mask_pyramid
from rgba_tpu.train.torch_import import (
    _transform, _win_gate_map, convert_state_dict)

from ref_torch import load_layers, load_model, nchw, nhwc, state_dict_numpy

torch.manual_seed(0)


def _convert_subtree(template, sd, mapper):
    """Map a standalone torch state dict onto a flax param subtree."""
    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in node.items()}
        torch_key, kind = mapper(prefix)
        val = np.asarray(sd[torch_key], dtype=np.float32)
        out = _transform(val, kind, prefix.endswith("kernel"))
        assert out.shape == tuple(np.shape(node)), (prefix, out.shape,
                                                    np.shape(node))
        return out
    return walk(template)


def _blocky_alpha(b, h, w, block, seed, p_zero=0.4):
    """Random alpha with exact-zero block-aligned regions (some windows
    fully transparent, exercising remove_zero_windows equivalence)."""
    rng = np.random.RandomState(seed)
    blocks = (rng.rand(b, h // block, w // block, 1) > p_zero).astype(
        np.float32)
    alpha = np.kron(blocks, np.ones((1, block, block, 1), np.float32))
    alpha *= rng.rand(b, h, w, 1).astype(np.float32)  # fractional values
    return alpha.astype(np.float32)


@pytest.fixture(scope="module")
def ref_layers():
    return load_layers()


# --------------------------------------------------------------------- GDN


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_parity(ref_layers, inverse):
    ch = 24
    tg = ref_layers["GDN"].GDN(ch, inverse=inverse)
    with torch.no_grad():  # perturb away from the identity-like init
        tg.beta.add_(torch.rand(ch) * 0.3)
        tg.gamma.add_(torch.rand(ch, ch) * 0.05)
    x = np.random.RandomState(1).randn(2, 12, 10, ch).astype(np.float32)
    ref = nhwc(tg(nchw(x)))

    model = JGDN(inverse=inverse)
    params = {"beta": tg.beta.detach().numpy(),
              "gamma": tg.gamma.detach().numpy()}
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


def test_gdn_lower_bound_grad_parity(ref_layers):
    """The LowerBound gradient gate (GDN.py:16-23) must match: grads pass
    iff input >= bound OR upstream grad < 0."""
    ch = 4
    tg = ref_layers["GDN"].GDN(ch)
    with torch.no_grad():  # push some beta/gamma below their bounds
        tg.beta[:2] = -0.5
        tg.gamma[0, 0] = -0.2
    x = np.random.RandomState(2).randn(1, 6, 6, ch).astype(np.float32)

    xt = nchw(x)
    out = tg(xt)
    loss = (out ** 2).sum()
    loss.backward()

    model = JGDN()
    params = {"beta": tg.beta.detach().numpy(),
              "gamma": tg.gamma.detach().numpy()}

    def loss_fn(p):
        return jnp.sum(model.apply({"params": p}, jnp.asarray(x)) ** 2)

    g = jax.grad(loss_fn)(params)
    np.testing.assert_allclose(np.asarray(g["beta"]),
                               tg.beta.grad.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g["gamma"]),
                               tg.gamma.grad.numpy(), atol=1e-4, rtol=1e-3)


# --------------------------------------------- masked window attention core


@pytest.mark.parametrize("dim,ws,ss,hw", [(192, 8, 4, 16), (80, 4, 2, 8)])
def test_masked_win_block_parity(ref_layers, dim, ws, ss, hw):
    """WinBasedAttention (masked, shifted) — the paper's core op — at both
    operating points (win 8/shift 4 @H/4, win 4/shift 2 @H/8)."""
    mwa = ref_layers["masked_win_attention"]
    tb = mwa.WinBasedAttention(dim=dim, num_heads=8, window_size=ws,
                               shift_size=ss)
    with torch.no_grad():  # make the rel-pos bias numerically significant
        tb.attn.relative_position_bias_table.mul_(50.0)

    b = 2
    x = np.random.RandomState(3).randn(b, hw, hw, dim).astype(np.float32)
    alpha = _blocky_alpha(b, hw, hw, ws, seed=4)
    assert (alpha.reshape(b, hw // ws, ws, hw // ws, ws).sum((2, 4)) == 0).any()

    ref = nhwc(tb(nchw(x), nchw(alpha)))

    sd = state_dict_numpy(tb)
    params = {"attn": {
        "relative_position_bias_table": sd["attn.relative_position_bias_table"],
        "qkv_kernel": sd["attn.qkv.weight"].T,
        "qkv_bias": sd["attn.qkv.bias"],
        "proj_kernel": sd["attn.proj.weight"].T,
        "proj_bias": sd["attn.proj.bias"],
    }}
    model = MaskedWinBlock(dim, num_heads=8, window_size=ws, shift_size=ss)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_masked_win_block_unmasked_twin_parity(ref_layers):
    """alpha=None == the unmasked Swin twin (win_attention.py:118-214)."""
    wa = ref_layers["win_attention"]
    tb = wa.WinBasedAttention(dim=64, num_heads=8, window_size=4, shift_size=2)
    with torch.no_grad():
        tb.attn.relative_position_bias_table.mul_(50.0)
    x = np.random.RandomState(5).randn(2, 8, 8, 64).astype(np.float32)
    ref = nhwc(tb(nchw(x)))

    sd = state_dict_numpy(tb)
    params = {"attn": {
        "relative_position_bias_table": sd["attn.relative_position_bias_table"],
        "qkv_kernel": sd["attn.qkv.weight"].T,
        "qkv_bias": sd["attn.qkv.bias"],
        "proj_kernel": sd["attn.proj.weight"].T,
        "proj_bias": sd["attn.proj.bias"],
    }}
    model = MaskedWinBlock(64, num_heads=8, window_size=4, shift_size=2)
    out = model.apply({"params": params}, jnp.asarray(x), None)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_win_gate_attention_parity(ref_layers):
    """Win_noShift_Attention: trunk * sigmoid(attn branch) + x, through the
    real _win_gate_map used by the checkpoint importer."""
    ma = ref_layers["Masked_Attention"]
    tg = ma.Win_noShift_Attention(dim=64, num_heads=8, window_size=4,
                                  shift_size=2)
    with torch.no_grad():
        tg.attn.attn.relative_position_bias_table.mul_(50.0)
    x = np.random.RandomState(6).randn(2, 8, 8, 64).astype(np.float32)
    alpha = _blocky_alpha(2, 8, 8, 4, seed=7)
    ref = nhwc(tg(nchw(x), nchw(alpha)))

    model = WinGateAttention(64, num_heads=8, window_size=4, shift_size=2)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(alpha))["params"]
    params = _convert_subtree(template, state_dict_numpy(tg), _win_gate_map)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


# ----------------------------------------------- full RGB transforms + prior


@pytest.fixture(scope="module")
def rgb_pair():
    """Reference RGB AutoEncoder + our RGBCodec with imported weights."""
    mod = load_model("rgb")
    tnet = mod.AutoEncoder().eval()
    with torch.no_grad():
        tnet.Encoder.attention1.attn.attn.relative_position_bias_table.mul_(50)
        tnet.Encoder.attention2.attn.attn.relative_position_bias_table.mul_(50)
        tnet.Decoder.attention1.attn.attn.relative_position_bias_table.mul_(50)
        tnet.Decoder.attention2.attn.attn.relative_position_bias_table.mul_(50)
        # non-zero entropy-bottleneck medians so the z STE-rounding offset
        # (AutoEncoderRGB_Journal.py:227-229) is exercised non-trivially
        tnet.entropy_bottleneck.quantiles[:, 0, 1].uniform_(-0.8, 0.8)
    model = RGBCodec()
    h = w = 64
    x = np.random.RandomState(8).rand(1, h, w, 3).astype(np.float32)
    alpha = _blocky_alpha(1, h, w, 16, seed=9)
    me = mask_pyramid(jnp.asarray(alpha))
    template = model.init({"params": jax.random.PRNGKey(0),
                           "noise": jax.random.PRNGKey(1)},
                          jnp.asarray(x), jnp.asarray(alpha),
                          jnp.asarray(alpha), me, training=False)["params"]
    params = convert_state_dict(state_dict_numpy(tnet), template, kind="rgb")
    return tnet, model, params, x, alpha


def test_rgb_analysis_transform_parity(rgb_pair):
    tnet, model, params, x, alpha = rgb_pair
    me = mask_pyramid(jnp.asarray(alpha))
    tme = [nchw(np.asarray(m)) for m in me]
    ref = nhwc(tnet.Encoder(nchw(x), nchw(alpha), *tme[:4]))
    out = model.apply({"params": params}, jnp.asarray(x), me[1], me[2],
                      method=lambda m, a, b, c: m.encoder(a, b, c))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_rgb_synthesis_transform_parity(rgb_pair):
    tnet, model, params, x, alpha = rgb_pair
    y_hat = np.random.RandomState(10).randn(1, 8, 8, 80).astype(np.float32)
    md = mask_pyramid(jnp.asarray(alpha))
    tmd = [nchw(np.asarray(m)) for m in md]
    ref = nhwc(tnet.Decoder(nchw(y_hat), nchw(alpha), *tmd[:4]))
    out = model.apply({"params": params}, jnp.asarray(y_hat), md[1], md[2],
                      method=lambda m, a, b, c: m.decoder(a, b, c))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_rgb_prior_heads_parity(rgb_pair):
    """h_a / h_mean_s / h_scale_s and every cc/lrp slice transform — pins
    the Sequential-index arithmetic in torch_import._prior_map."""
    tnet, model, params, x, alpha = rgb_pair
    y = np.random.RandomState(11).randn(1, 8, 8, 80).astype(np.float32)
    z = np.random.RandomState(12).randn(1, 1, 1, 192).astype(np.float32)

    ref_z = nhwc(tnet.h_a(nchw(y)))
    out_z = model.apply({"params": params}, jnp.asarray(y),
                        method=lambda m, a: m.prior.h_a(a))
    np.testing.assert_allclose(np.asarray(out_z), ref_z, atol=3e-5, rtol=1e-4)

    ref_mean = nhwc(tnet.h_mean_s(nchw(z)))
    ref_scale = nhwc(tnet.h_scale_s(nchw(z)))
    out_mean, out_scale = model.apply(
        {"params": params}, jnp.asarray(z),
        method=lambda m, a: (m.prior.h_mean_s(a), m.prior.h_scale_s(a)))
    np.testing.assert_allclose(np.asarray(out_mean), ref_mean, atol=3e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_scale), ref_scale, atol=3e-5,
                               rtol=1e-4)

    for i in (0, 4, 9):  # first, mid (max support), last slice
        cin = 80 + 8 * min(i, 5)
        s = np.random.RandomState(13 + i).randn(1, 8, 8, cin).astype(
            np.float32)
        for which in ("cc_mean_transforms", "cc_scale_transforms"):
            ref = nhwc(getattr(tnet, which)[i](nchw(s)))
            out = model.apply(
                {"params": params}, jnp.asarray(s),
                method=lambda m, a, _w=which, _i=i:
                    getattr(m.prior, _w)[_i](a))
            np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5,
                                       rtol=1e-4, err_msg=f"{which}[{i}]")
        lin = 80 + 8 * min(i + 1, 6)
        s = np.random.RandomState(33 + i).randn(1, 8, 8, lin).astype(
            np.float32)
        ref = nhwc(tnet.lrp_transforms[i](nchw(s)))
        out = model.apply({"params": params}, jnp.asarray(s),
                          method=lambda m, a, _i=i: m.prior.lrp_transforms[_i](a))
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4,
                                   err_msg=f"lrp[{i}]")


def test_full_rgb_forward_parity(rgb_pair):
    """The COMPLETE reference AutoEncoder.forward — transforms, entropy
    bottleneck, 10-slice channel-AR gaussian rate, masked MSE
    (AutoEncoderRGB_Journal.py:203-296) — vs RGBCodec through imported
    weights.  Pins x_hat AND the R-D surface (bpp_y, bpp_z, mse) in fp32,
    closing the gap left by the transform-only tests above."""
    tnet, model, params, x, alpha = rgb_pair
    # decoded-alpha stand-in: perturb the GT inside the visible region so
    # the in-forward 8-bit re-rounding and the md pyramid differ from me
    rng = np.random.RandomState(40)
    reconmask = np.clip(
        alpha + 0.07 * rng.rand(*alpha.shape).astype(np.float32) * (alpha > 0),
        0.0, 1.0).astype(np.float32)
    me = mask_pyramid(jnp.asarray(alpha))
    tme = [nchw(np.asarray(m)) for m in me]

    with torch.no_grad():
        t_xhat, t_mse, t_bpp, t_bpp_y, t_bpp_z = tnet(
            nchw(x), nchw(alpha), nchw(reconmask), *tme[:4])

    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(alpha),
                      jnp.asarray(reconmask), me, training=False)

    np.testing.assert_allclose(np.asarray(out["x_hat"]), nhwc(t_xhat),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(float(out["mse_loss"]), float(t_mse),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(float(out["bpp_y"]), float(t_bpp_y),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["bpp_z"]), float(t_bpp_z),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["bpp"]), float(t_bpp),
                               atol=2e-5, rtol=1e-4)


# ------------------------------------------------------- mask codec modules


@pytest.fixture(scope="module")
def mask_pair():
    mod = load_model("mask")
    tnet = mod.AutoEncoder().eval()
    with torch.no_grad():
        tnet.entropy_bottleneck.quantiles[:, 0, 1].uniform_(-0.8, 0.8)
    model = MaskCodec()
    alpha = _blocky_alpha(1, 64, 64, 16, seed=14)
    template = model.init({"params": jax.random.PRNGKey(0),
                           "noise": jax.random.PRNGKey(1)},
                          jnp.asarray(alpha), training=False)["params"]
    params = convert_state_dict(state_dict_numpy(tnet), template, kind="mask")
    return tnet, model, params, alpha


def test_mask_encoder_parity(mask_pair):
    tnet, model, params, alpha = mask_pair
    ref = nhwc(tnet.EncoderMask(nchw(alpha)))
    out = model.apply({"params": params}, jnp.asarray(alpha),
                      method=lambda m, a: m.encoder(a))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_mask_decoder_parity(mask_pair):
    tnet, model, params, alpha = mask_pair
    y_hat = np.random.RandomState(15).randn(1, 8, 8, 80).astype(np.float32)
    ref = nhwc(tnet.DecoderMask(nchw(y_hat)))
    out = model.apply({"params": params}, jnp.asarray(y_hat),
                      method=lambda m, a: m.decoder(a))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_mask_prior_slice_parity(mask_pair):
    tnet, model, params, alpha = mask_pair
    for i in (0, 4):  # 5-slice head, 16-channel slices
        cin = 80 + 16 * min(i, 5)
        s = np.random.RandomState(16 + i).randn(1, 8, 8, cin).astype(
            np.float32)
        ref = nhwc(tnet.cc_mean_transforms[i](nchw(s)))
        out = model.apply({"params": params}, jnp.asarray(s),
                          method=lambda m, a, _i=i:
                              m.prior.cc_mean_transforms[_i](a))
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4,
                                   err_msg=f"cc_mean[{i}]")


def test_full_mask_forward_parity(mask_pair):
    """Complete reference mask AutoEncoder.forward (transforms + 5-slice
    channel-AR entropy + plain MSE, AutoEncoderMask_Journal.py:248-316) vs
    MaskCodec with imported weights — x_hat, mse, bpp_y, bpp_z in fp32."""
    tnet, model, params, alpha = mask_pair
    with torch.no_grad():
        t_xhat, t_mse, t_bpp, t_bpp_y, t_bpp_z = tnet(nchw(alpha))
    out = model.apply({"params": params}, jnp.asarray(alpha), training=False)
    np.testing.assert_allclose(np.asarray(out["x_hat"]), nhwc(t_xhat),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(float(out["mse_loss"]), float(t_mse),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(float(out["bpp_y"]), float(t_bpp_y),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["bpp_z"]), float(t_bpp_z),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["bpp"]), float(t_bpp),
                               atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------- mask pyramid


def test_supply_mask_parity(ref_layers):
    sm = ref_layers["SupplyMask"].SupplyMaskToTransform()
    alpha = _blocky_alpha(2, 64, 64, 8, seed=17)
    refs = sm(nchw(alpha))
    ours = mask_pyramid(jnp.asarray(alpha))
    assert len(refs) >= 4
    for r, o in zip(refs[:4], ours[:4]):
        np.testing.assert_allclose(np.asarray(o), nhwc(r), atol=1e-6,
                                   rtol=1e-5)
