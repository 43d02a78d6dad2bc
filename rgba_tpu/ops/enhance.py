"""Decoder-side enhancement tail (DSE).

Reference: layers/TransformRGB.py:16-49 (ReLU variant, RGB decoder) and
models/AutoEncoderMask_Journal.py:16-48 (LeakyReLU variant, mask decoder).
Structure: 1x1 in-conv -> 3 residual enhancement blocks -> long skip ->
1x1 out-conv -> identity skip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY
from .conv import Conv


class EnhancementBlock(nn.Module):
    filters: int = 32
    leaky: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        y = Conv(self.filters, kernel_size=3, stride=1, policy=self.policy,
                 name="conv1")(x)
        y = jax.nn.leaky_relu(y, 0.01) if self.leaky else jax.nn.relu(y)
        y = Conv(self.filters, kernel_size=3, stride=1, policy=self.policy,
                 name="conv2")(y)
        return x + y


class DSE(nn.Module):
    in_ch: int = 3
    filters: int = 32
    leaky: bool = False   # mask-codec DSE uses LeakyReLU enhancement blocks
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        identity = x
        first = Conv(self.filters, kernel_size=1, stride=1, policy=self.policy,
                     name="input_conv")(x)
        y = first
        for i in range(1, 4):
            y = EnhancementBlock(self.filters, leaky=self.leaky,
                                 policy=self.policy, name=f"enh{i}")(y)
        y = y + first
        y = Conv(self.in_ch, kernel_size=1, stride=1, policy=self.policy,
                 name="output_conv")(y)
        return y + identity
