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
    # alternative lowering for (k5, s2, p2): space-to-depth + one 3x3 conv.
    # Honest TPU timing showed XLA's direct strided conv is faster (5.5 vs
    # 6.9 ms @256x384x192); kept off by default, available for other shapes.
    use_space_to_depth: bool = False
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
        # note: the alternative lowering flag wins over policy.int8_conv
        # (the s2d path stays float) — no call site sets both today
        if (self.use_space_to_depth and (k, self.stride, pad) == (5, 2, 2)
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            y = _strided_conv5x5_s2_s2d(x.astype(dtype), w.astype(dtype),
                                        self.policy.precision)
        else:
            from .quant import policy_conv
            y = policy_conv(x, w, self.policy,
                            window_strides=_pair(self.stride),
                            padding=((pad, pad), (pad, pad)))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.policy.param_dtype)
            y = y + b.astype(dtype)
        return y


def _strided_conv5x5_s2_s2d(x, w, precision):
    """Conv(k=5, s=2, p=2) as space-to-depth + ONE 3x3 conv.

    out[m] = sum_q x[2m-2+q] W[q]: even input phase contributes taps
    {W0,W2,W4} at phase index {m-1,m,m+1}; odd phase contributes {W1,W3}
    at {m-1,m} -> both are 3-tap kernels over the phase grid with pad
    (1,1): even [W0,W2,W4], odd [W1,W3,0].  K grows to 4C (great MXU
    contraction) and the 2x2 subsampling becomes a free relayout.
    """
    b, h2, w2, c = x.shape
    t_h, t_w = h2 // 2, w2 // 2
    # phase layout: channel block (i*2 + j) holds x[2h+i, 2w+j]
    xs = x.reshape(b, t_h, 2, t_w, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, t_h, t_w, 4 * c)

    zero = jnp.zeros_like(w[0:1])
    rows_e = w[jnp.array([0, 2, 4])]                      # (3,5,I,O)
    rows_o = jnp.concatenate([w[jnp.array([1, 3])], zero], 0)

    def cols(rows, odd):
        if odd:
            zc = jnp.zeros_like(rows[:, 0:1])
            return jnp.concatenate([rows[:, jnp.array([1, 3])], zc], 1)
        return rows[:, jnp.array([0, 2, 4])]

    # kernel block for input phase (i, j): (3,3,I,O)
    k_ph = [cols(rows_e, False), cols(rows_e, True),
            cols(rows_o, False), cols(rows_o, True)]
    w_all = jnp.stack(k_ph, axis=2)                       # (3,3,4,I,O)
    w_all = w_all.reshape(3, 3, 4 * c, w.shape[-1])

    return jax.lax.conv_general_dilated(
        xs, w_all, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


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
    # alternative lowering for (k5, s2, p2, op1): one 3x3 conv to 4*O
    # channels + pixel shuffle. Honest TPU timing showed XLA's input-dilated
    # lowering is faster (16.9 vs 19.9 ms @256x384x192); off by default.
    use_subpixel: bool = False
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
        # alternative-lowering flag wins over policy.int8_conv, as in Conv
        if self.use_subpixel and (k, self.stride, p, op) == (5, 2, 2, 1):
            y = _subpixel_deconv5x5_s2(x.astype(dtype), w.astype(dtype),
                                       self.policy.precision)
        elif self.policy.int8_conv:
            from .quant import int8_conv
            y = int8_conv(x.astype(dtype), w,
                          window_strides=(1, 1),
                          padding=((lo, hi), (lo, hi)),
                          lhs_dilation=_pair(self.stride),
                          flip_kernel=True)
        else:
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


def _subpixel_deconv5x5_s2(x, w, precision):
    """ConvTranspose(k=5, s=2, p=2, op=1) as ONE 3x3 conv to 4*O channels +
    pixel shuffle — identical math to the input-dilation lowering but
    without spending 75% of the MXU work on inserted zeros.

    Derivation (per dim): output y takes kernel tap q = y - 2t + 2 from
    input t.  Even outputs (y=2m) use taps {4,2,0} of inputs {m-1,m,m+1};
    odd outputs (y=2m+1) use taps {3,1} of inputs {m,m+1} — both expressible
    as 3-tap kernels over x[m-1..m+1] with pad (1,1): even = [W4,W2,W0],
    odd = [0,W3,W1].  The 2-D cross product gives four 3x3 phase kernels
    stacked channel-last in pixel-shuffle order (c*4 + i*2 + j).
    """
    b, t_h, t_w, _ = x.shape
    o = w.shape[-1]

    zero_row = jnp.zeros_like(w[0:1])
    rows_e = w[jnp.array([4, 2, 0])]                              # (3,5,I,O)
    rows_o = jnp.concatenate([zero_row, w[jnp.array([3, 1])]], 0)

    def cols(rows, odd):
        if odd:
            zero_col = jnp.zeros_like(rows[:, 0:1])
            return jnp.concatenate(
                [zero_col, rows[:, jnp.array([3, 1])]], 1)        # (3,3,I,O)
        return rows[:, jnp.array([4, 2, 0])]

    k00 = cols(rows_e, False)
    k01 = cols(rows_e, True)
    k10 = cols(rows_o, False)
    k11 = cols(rows_o, True)
    w_all = jnp.stack([k00, k01, k10, k11], axis=-1)              # (3,3,I,O,4)
    w_all = w_all.reshape(3, 3, w.shape[2], o * 4)

    y = jax.lax.conv_general_dilated(
        x, w_all, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return pixel_shuffle(y, 2)


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
            x = self.policy.gelu(x)
        return Conv(self.out, kernel_size=3, stride=1, policy=self.policy,
                    name=f"conv{len(self.hidden)}")(x)
