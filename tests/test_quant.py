"""int8 serving-conv tests (ops/quant.py, Policy.int8_conv).

The int8 path is a serving-only W8A8 dynamic quantization of every conv;
these tests pin (a) its accuracy envelope vs fp32, (b) geometry parity
with the float lowering for both conv and transposed conv, and (c) the
bit-exactness of the packed-DSE int8 route vs the plain int8 chain
(packing is a channel permutation, per-output-channel weight scales tile
with the kron(I,w) block-diagonal, and int32 accumulation is exact).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.core.precision import (DEFAULT_POLICY, SERVE_INT8_POLICY,
                                     Policy, policy_from_str)
from rgba_tpu.ops.conv import Conv, ConvTranspose
from rgba_tpu.ops.enhance import DSE
from rgba_tpu.ops.quant import int8_conv

INT8_FP32 = Policy(int8_conv=True)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_int8_conv_matches_fp32_within_quant_noise():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 16, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 64)) * 0.1
    y8 = int8_conv(x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)))
    yf = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y8.shape == yf.shape
    assert _rel_err(y8, yf) < 0.02


def test_int8_conv_transpose_geometry_and_accuracy():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16), jnp.float32)
    mod32 = ConvTranspose(features=8, kernel_size=5, stride=2,
                          policy=DEFAULT_POLICY)
    params = mod32.init(jax.random.PRNGKey(3), x)
    yf = mod32.apply(params, x)
    y8 = ConvTranspose(features=8, kernel_size=5, stride=2,
                       policy=INT8_FP32).apply(params, x)
    assert y8.shape == yf.shape == (1, 16, 16, 8)
    assert _rel_err(y8, yf) < 0.03


def test_int8_strided_conv_module():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 8), jnp.float32)
    mod = Conv(features=24, kernel_size=5, stride=2, policy=DEFAULT_POLICY)
    params = mod.init(jax.random.PRNGKey(5), x)
    yf = mod.apply(params, x)
    y8 = Conv(features=24, kernel_size=5, stride=2,
              policy=INT8_FP32).apply(params, x)
    assert y8.shape == yf.shape == (1, 8, 8, 24)
    assert _rel_err(y8, yf) < 0.03


def test_packed_dse_int8_bit_exact_vs_plain_int8():
    plain = dataclasses.replace(INT8_FP32, packed_dse=False)
    packed = dataclasses.replace(INT8_FP32, packed_dse=True)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 16, 16, 3), jnp.float32)
    mod = DSE(in_ch=3, filters=32, policy=plain)
    params = mod.init(jax.random.PRNGKey(7), x)
    y_plain = mod.apply(params, x)
    y_packed = DSE(in_ch=3, filters=32, policy=packed).apply(params, x)
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_packed))


def test_serve_int8_policy_wiring():
    p = policy_from_str("serve-int8")
    assert p.int8_conv and p.packed_dse and p.fused_win_attn
    assert p.compute_dtype == jnp.bfloat16
    assert policy_from_str("int8").int8_conv
    # no training/parity policy may quantize
    assert not DEFAULT_POLICY.int8_conv
    assert not policy_from_str("bf16").int8_conv
    assert SERVE_INT8_POLICY.int8_conv


def test_int8_full_codec_forward_sane():
    """RGB codec forward under the int8 policy: runs, finite, and close to
    the fp32 forward on random-init weights (quantization noise only)."""
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    pol8 = dataclasses.replace(INT8_FP32, packed_dse=True)
    key = jax.random.PRNGKey(8)
    alpha = (jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 1))
             > 0.3).astype(jnp.float32)
    rgb = jax.random.uniform(key, (4, 64, 64, 3)) * alpha
    me = mask_pyramid(alpha)
    model = RGBCodec(policy=DEFAULT_POLICY)
    params = model.init({"params": jax.random.PRNGKey(10),
                         "noise": jax.random.PRNGKey(11)},
                        rgb, alpha, alpha, me, training=True)
    out_f = model.apply(params, rgb, alpha, alpha, me, training=False)
    out_8 = RGBCodec(policy=pol8).apply(params, rgb, alpha, alpha, me,
                                        training=False)
    xf, x8 = out_f["x_hat"], out_8["x_hat"]
    assert jnp.isfinite(x8).all()
    assert _rel_err(x8, xf) < 0.08
