"""Hyperprior + channel-wise autoregressive entropy head.

Shared by both codecs (identical structure in the reference; only the
latent width M and slice count differ):
  * h_a:        conv3x3 chain M->320->288->256->224->192, strides 2/1/2/1/2
                (AutoEncoderRGB_Journal.py:135-145, AutoEncoderMask_Journal.py:182-192)
  * h_mean_s /
    h_scale_s:  subpel/conv chain 192->...->M, x8 upsample
                (AutoEncoderRGB_Journal.py:147-169)
  * cc_mean/cc_scale/lrp transforms: per-slice conv3x3 stacks conditioning
    each slice's (mu, sigma) on the hyper latents plus at most 5 previously
    decoded slices; latent-residual prediction with 0.5*tanh
    (AutoEncoderRGB_Journal.py:171-198,240-266)

TPU design: the slice loop is a *static* Python unroll (5 or 10 slices,
channels fixed) — each iteration is pure convs, XLA fuses them; no lax.scan
is possible anyway because channel widths of the support stack grow.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY
from ..entropy.bottleneck import EntropyBottleneck
from ..entropy.gaussian import GaussianConditional
from ..ops.conv import Conv, SubpelConv
from ..ops.math import ste_round

HYPER_CH = (320, 288, 256, 224, 192)
Z_CHANNELS = 192


class HyperAnalysis(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, y):
        chs = HYPER_CH
        strides = (2, 1, 2, 1, 2)
        x = y
        for i, (c, s) in enumerate(zip(chs, strides)):
            x = Conv(c, kernel_size=3, stride=s, policy=self.policy,
                     name=f"conv{i}")(x)
            if i < len(chs) - 1:
                x = self.policy.gelu(x)
        return x


class HyperSynthesis(nn.Module):
    out_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, z_hat):
        x = SubpelConv(192, r=2, policy=self.policy, name="up0")(z_hat)
        x = self.policy.gelu(x)
        x = Conv(224, kernel_size=3, stride=1, policy=self.policy,
                 name="conv1")(x)
        x = self.policy.gelu(x)
        x = SubpelConv(256, r=2, policy=self.policy, name="up2")(x)
        x = self.policy.gelu(x)
        x = Conv(288, kernel_size=3, stride=1, policy=self.policy,
                 name="conv3")(x)
        x = self.policy.gelu(x)
        x = SubpelConv(self.out_channels, r=2, policy=self.policy,
                       name="up4")(x)
        return x


class SliceTransform(nn.Module):
    """conv3x3(…->224) GELU conv3x3(224->128) GELU conv3x3(128->out)."""

    out_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        x = Conv(224, kernel_size=3, stride=1, policy=self.policy,
                 name="conv0")(x)
        x = self.policy.gelu(x)
        x = Conv(128, kernel_size=3, stride=1, policy=self.policy,
                 name="conv1")(x)
        x = self.policy.gelu(x)
        return Conv(self.out_channels, kernel_size=3, stride=1,
                    policy=self.policy, name="conv2")(x)


class ChannelARPrior(nn.Module):
    """The complete entropy head over a latent y (B, H, W, M)."""

    latent_channels: int            # M
    num_slices: int                 # 10 (RGB) or 5 (mask)
    max_support_slices: int = 5
    policy: Policy = DEFAULT_POLICY
    # multi-chip training (SURVEY §2.3): a batch-leading NamedSharding
    # pins the hyper tensors (z, z_hat, latent means/scales) to
    # batch-only sharding.  Without it GSPMD's propagation through the
    # entropy head is unspecified, and on a 2-D (space, data) mesh the
    # spatially-collapsed z (B, 1, 1, 192) triggers an "involuntary full
    # rematerialization" reshard of its gradient (MULTICHIP_r03 tail).
    # with_sharding_constraint also constrains the cotangent, so one
    # forward annotation covers the backward pass.  None (default) adds
    # nothing to the program.
    data_sharding: Any = None

    def _constrain(self, x):
        s = self.data_sharding
        if s is None:
            return x
        spec0 = s.spec[0] if len(s.spec) else None
        axes = (spec0,) if isinstance(spec0, str) else tuple(spec0 or ())
        n0 = 1
        for a in axes:
            n0 *= s.mesh.shape[a]
        if n0 <= 1 or x.shape[0] % n0:
            # e.g. Module.init's batch-1 trace, or an eval batch that
            # doesn't divide the data axis — the constraint is a
            # performance pin, not a correctness requirement
            return x
        return jax.lax.with_sharding_constraint(x, s)

    def setup(self):
        m = self.latent_channels
        sw = m // self.num_slices   # slice width
        self.h_a = HyperAnalysis(policy=self.policy)
        self.h_mean_s = HyperSynthesis(m, policy=self.policy)
        self.h_scale_s = HyperSynthesis(m, policy=self.policy)
        self.cc_mean_transforms = [
            SliceTransform(sw, policy=self.policy) for _ in range(self.num_slices)]
        self.cc_scale_transforms = [
            SliceTransform(sw, policy=self.policy) for _ in range(self.num_slices)]
        self.lrp_transforms = [
            SliceTransform(sw, policy=self.policy) for _ in range(self.num_slices)]
        self.entropy_bottleneck = EntropyBottleneck(Z_CHANNELS)
        self.gaussian = GaussianConditional()

    # --------------------------------------------------------------- pieces

    def hyper_encode(self, y):
        return self.h_a(y)

    def hyper_decode(self, z_hat):
        return self.h_mean_s(z_hat), self.h_scale_s(z_hat)

    def slice_stats(self, latent_means, latent_scales, support, index: int,
                    y_hw: Tuple[int, int]):
        """(mu, scale) for slice `index` given decoded support slices."""
        h, w = y_hw
        mean_in = jnp.concatenate([latent_means] + support, axis=-1)
        scale_in = jnp.concatenate([latent_scales] + support, axis=-1)
        mu = self.cc_mean_transforms[index](mean_in)[:, :h, :w, :]
        scale = self.cc_scale_transforms[index](scale_in)[:, :h, :w, :]
        return mu, scale

    def slice_lrp(self, latent_means, support, y_hat_slice, index: int):
        lrp_in = jnp.concatenate([latent_means] + support + [y_hat_slice],
                                 axis=-1)
        return 0.5 * jnp.tanh(self.lrp_transforms[index](lrp_in))

    def bottleneck_round(self, z, training: bool):
        return self.entropy_bottleneck(z, training=training)

    # -------------------------------------------------------------- forward

    def __call__(self, y, training: bool = False, gate=None):
        """Full training/eval entropy pass.

        Returns dict: y_hat, y_likelihoods, z_likelihoods, means, scales.
        Matches the slice loop at AutoEncoderRGB_Journal.py:223-271 /
        AutoEncoderMask_Journal.py:252-298.

        gate: optional (B, H, W, 1) float {0,1} alpha-rate gate at latent
        resolution.  Where gate==0 the symbol is pinned to 0 (y_hat = mu
        + lrp) and its likelihood to 1 (zero bits) — the estimate analog
        of the real codec skipping those symbols entirely (eval/codec_io
        rate_gate).  Serving/eval knob; None during training.
        """
        # batch-only sharding for the WHOLE entropy head (data_sharding
        # set): the hyper path's spatial dims collapse (z = y/8) below any
        # realistic `space` axis, so height-sharding cannot survive h_a —
        # pinning the boundary at y makes the space->batch transition one
        # cheap all-gather on y instead of a GSPMD last-resort reshard of
        # z's gradient deep inside the backward pass.  The head is a tiny
        # fraction of model FLOPs; the big transforms keep their 2-D
        # (space, data) sharding.
        y = self._constrain(y.astype(jnp.float32))
        b, h, w, m = y.shape
        z = self._constrain(self.h_a(y))
        z_hat, z_lik = self.entropy_bottleneck(z.astype(jnp.float32),
                                               training=training)
        z_hat = self._constrain(z_hat)
        latent_means, latent_scales = self.hyper_decode(z_hat)
        latent_means = self._constrain(latent_means.astype(jnp.float32))
        latent_scales = self._constrain(latent_scales.astype(jnp.float32))

        sw = m // self.num_slices
        y_slices = [y[..., i * sw:(i + 1) * sw] for i in range(self.num_slices)]
        y_hat_slices: List[jnp.ndarray] = []
        liks, mus, scales = [], [], []
        for i, y_slice in enumerate(y_slices):
            support = y_hat_slices[:self.max_support_slices]
            mu, scale = self.slice_stats(latent_means, latent_scales,
                                         support, i, (h, w))
            rng = self.make_rng("noise") if training else None
            lik = self.gaussian.likelihood(y_slice, scale, mu,
                                           training=training, rng=rng)
            if gate is not None:
                lik = jnp.where(gate > 0, lik, 1.0)
                y_hat = ste_round((y_slice - mu) * gate) + mu
            else:
                y_hat = ste_round(y_slice - mu) + mu
            y_hat = y_hat + self.slice_lrp(latent_means, support, y_hat, i)
            y_hat_slices.append(y_hat)
            liks.append(lik)
            mus.append(mu)
            scales.append(scale)

        return {
            "y_hat": self._constrain(jnp.concatenate(y_hat_slices, axis=-1)),
            "y_likelihoods": jnp.concatenate(liks, axis=-1),
            "z_likelihoods": z_lik,
            "means": jnp.concatenate(mus, axis=-1),
            "scales": jnp.concatenate(scales, axis=-1),
            "z_shape": z.shape,
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()
