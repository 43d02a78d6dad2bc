"""Dynamic W8A8 int8 convolution for serving.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS), and int8 operands halve HBM traffic — the two resources our conv
pipelines are bounded by (PERFORMANCE.md: convs sit at 30-45% MXU, the
DSE chain is bandwidth-bound).  This module implements the standard
dynamic-quantization recipe:

  * weights: symmetric per-output-channel scales (max|w| over k,k,cin),
  * activations: symmetric per-tensor scale computed on the fly
    (one fused reduction per conv — cheap next to the conv itself),
  * integer conv accumulating in int32 (``preferred_element_type``),
  * dequantize with the combined scale, add bias in the compute dtype.

Serving-only, forward/metric paths only: ``jnp.round`` has a zero
gradient (no training policy sets the flag), and the per-TENSOR dynamic
activation scales couple every image's numerics to its batchmates — so
like every non-fp32 policy, int8 must NOT drive the real-bitstream codec
(CodecIO pins the fp32 policy; encode/decode stat recomputation requires
bit-exact agreement that batch-coupled scales cannot provide).

Measured verdict (PERFORMANCE.md "int8 MXU probe"): 0.76x end-to-end vs
bf16 serve on v5e at PSNR parity — the dynamic per-conv quantize/dequant
passes (two extra HBM sweeps each) cost more than the 2x int8 MXU rate
returns on these bandwidth-bound shapes.  Kept opt-in (`serve-int8`) for
API completeness and for configs with denser, MXU-bound convs.

Reference analog: none — the reference serves fp32 (trainRGB.py:281-291).
This is the TPU-native lever its CUDA fp32 path doesn't have.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _quantize_activation(x):
    """Per-tensor symmetric int8 quantization; returns (int8 x, fp32 scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, _EPS)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _quantize_weight(w):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0, _EPS)
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale.reshape(-1)          # (cout,)


def int8_conv(x, w, *, window_strides, padding, lhs_dilation=None,
              flip_kernel=False, out_dtype=None):
    """NHWC/HWIO conv with dynamically int8-quantized operands.

    Drop-in for the float ``lax.conv_general_dilated`` calls in
    ops/conv.py / ops/attention.py / ops/enhance.py: same geometry
    arguments, fp32 accumulation semantics via int32, output cast to
    ``out_dtype`` (default: x.dtype).  ``lhs_dilation`` (transposed convs)
    inserts exact int8 zeros, so deconv geometry is unchanged.
    """
    out_dtype = out_dtype or x.dtype
    xq, sx = _quantize_activation(x)
    if flip_kernel:
        w = jnp.flip(w, axis=(0, 1))
    wq, sw = _quantize_weight(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=window_strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw)   # sw broadcasts over cout
    return y.astype(out_dtype)


def policy_conv(x, w, policy, *, window_strides=(1, 1), padding):
    """Shared float/int8 conv dispatch for the stride-1/stride-N NHWC
    call sites (ops/attention.py, ops/enhance.py, ops/conv.py): ONE place
    holds the `Policy.int8_conv` branch so the quantization recipe can't
    silently diverge between modules.  No bias."""
    if policy.int8_conv:
        return int8_conv(x.astype(policy.compute_dtype), w,
                         window_strides=window_strides, padding=padding)
    dt = policy.compute_dtype
    return jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), window_strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision)
