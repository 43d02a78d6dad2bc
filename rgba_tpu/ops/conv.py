"""NHWC conv primitives with PyTorch-compatible geometry.

The reference composes torch Conv2d / ConvTranspose2d with explicit paddings
(models/AutoEncoderRGB_Journal.py:20-27,75-83, compressai conv3x3 /
subpel_conv3x3).  Here every conv is a thin flax module over
``lax.conv_general_dilated`` in NHWC/HWIO so that

  * geometry matches torch exactly (symmetric padding k//2; transposed convs
    use lhs dilation with pad lo = k-1-p, hi = k-1-p+output_padding and a
    spatially-flipped kernel) — required for the .pth.tar weight importer;
  * compute can run in bf16 on the MXU while params stay fp32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """Conv2d(in->features, k, stride, padding=k//2 by default), NHWC."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int | None = None   # None -> k//2 (torch default in reference)
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2 if self.padding is None else self.padding
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, x.shape[-1], self.features),
            self.policy.param_dtype,
        )
        dtype = self.policy.compute_dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=_pair(self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.policy.precision,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.policy.param_dtype)
            y = y + b.astype(dtype)
        return y


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d equivalent (kernel flip + input dilation).

    Matches nn.ConvTranspose2d(k, stride, padding=p, output_padding=op)
    (reference deconv factory, AutoEncoderRGB_Journal.py:75-83): output size
    is (H-1)*s - 2p + k + op. Weights stored HWIO with I=in, O=out; the torch
    importer transposes (in,out,kh,kw) -> (kh,kw,in,out) and this module
    flips spatial dims at call time.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int | None = None        # None -> k//2
    output_padding: int | None = None  # None -> stride-1
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2 if self.padding is None else self.padding
        op = (self.stride - 1) if self.output_padding is None else self.output_padding
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, x.shape[-1], self.features),
            self.policy.param_dtype,
        )
        dtype = self.policy.compute_dtype
        lo = k - 1 - p
        hi = k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            jnp.flip(w, axis=(0, 1)).astype(dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=_pair(self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.policy.precision,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.policy.param_dtype)
            y = y + b.astype(dtype)
        return y


def pixel_shuffle(x, r: int):
    """NHWC PixelShuffle with torch channel ordering (c*r*r + i*r + j)."""
    b, h, w, c = x.shape
    assert c % (r * r) == 0
    cout = c // (r * r)
    x = x.reshape(b, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, cout
    return x.reshape(b, h * r, w * r, cout)


class SubpelConv(nn.Module):
    """compressai subpel_conv3x3: Conv3x3(C -> out*r^2) + PixelShuffle(r)."""

    features: int
    r: int = 2
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features * self.r * self.r, kernel_size=3, stride=1,
                 policy=self.policy, name="conv")(x)
        return pixel_shuffle(y, self.r)


class MLPConvStack(nn.Module):
    """conv3x3 -> GELU -> conv3x3 -> GELU -> conv3x3 stack used by the
    slice-conditioning transforms (AutoEncoderRGB_Journal.py:171-198)."""

    hidden: Sequence[int]
    out: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = Conv(h, kernel_size=3, stride=1, policy=self.policy,
                     name=f"conv{i}")(x)
            x = jax.nn.gelu(x, approximate=False)
        return Conv(self.out, kernel_size=3, stride=1, policy=self.policy,
                    name=f"conv{len(self.hidden)}")(x)
