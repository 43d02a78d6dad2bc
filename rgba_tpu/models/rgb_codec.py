"""RGB codec with alpha-masked window attention.

Reference: models/AutoEncoderRGB_Journal.py:120-415 and
layers/TransformRGB.py:52-100.

Analysis (TransformRGB.py:52-75):
  conv5x5s2+GDN x2 -> WinGate(win 8, shift 4) @H/4 gated by me2
  -> conv5x5s2+GDN -> 1x1 conv to M=80 -> WinGate(win 4, shift 2) @H/8 by me3
Synthesis (TransformRGB.py:77-100): mirror with IGDN/deconv, gates md3/md2,
  DSE tail.
Entropy: hyperprior + 10-slice channel-AR head.
Loss: masked MSE normalized by visible-pixel count
  (reconstruct_error, AutoEncoderRGB_Journal.py:36-64) + clamped bpp.
Quirk kept: reconmask is re-quantized to 8 bits inside forward (:211-214).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY
from ..entropy.rate import bpp as bpp_of
from ..ops.attention import WinGateAttention
from ..ops.conv import Conv, ConvTranspose
from ..ops.enhance import DSE
from ..ops.gdn import GDN
from ..ops.mask_pyramid import mask_pyramid
from .hyperprior import ChannelARPrior

RGB_N = 192
RGB_M = 80


def reconstruct_error(x, x_hat, input_mask):
    """Masked MSE per visible pixel (AutoEncoderRGB_Journal.py:36-64).

    x, x_hat: (B, H, W, 3); input_mask: (B, H, W, 1).
    Binarized GT mask selects pixels; the sum of squared errors per sample
    is divided by the count of unmasked *values* (mask broadcast over 3
    channels), then averaged over the batch.
    """
    m = (input_mask > 0.0).astype(jnp.float32)
    m3 = jnp.broadcast_to(m, x.shape)
    err = jnp.square((x - x_hat) * m3)
    per_sample = jnp.sum(err, axis=(1, 2, 3))
    count = jnp.maximum(jnp.sum(m3, axis=(1, 2, 3)), 1.0)
    return jnp.mean(per_sample / count)


class AnalysisTransform(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, me2, me3):
        p = self.policy
        y = Conv(RGB_N, 5, 2, policy=p, name="x1")(x)
        y = GDN(policy=p, name="gdn1")(y)
        y = Conv(RGB_N, 5, 2, policy=p, name="x2")(y)
        y = GDN(policy=p, name="gdn2")(y)
        y = WinGateAttention(RGB_N, num_heads=8, window_size=8, shift_size=4,
                             policy=p, name="attention1")(y, me2)
        y = Conv(RGB_N, 5, 2, policy=p, name="x3")(y)
        y = GDN(policy=p, name="gdn3")(y)
        y = Conv(RGB_M, 1, 1, policy=p, name="x4")(y)
        y = WinGateAttention(RGB_M, num_heads=8, window_size=4, shift_size=2,
                             policy=p, name="attention2")(y, me3)
        return y


class SynthesisTransform(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, y_hat, md2, md3):
        p = self.policy
        x = WinGateAttention(RGB_M, num_heads=8, window_size=4, shift_size=2,
                             policy=p, name="attention1")(y_hat, md3)
        x = Conv(RGB_N, 1, 1, policy=p, name="x1")(x)
        x = GDN(inverse=True, policy=p, name="igdn1")(x)
        x = ConvTranspose(RGB_N, 5, 2, policy=p, name="x2")(x)
        x = GDN(inverse=True, policy=p, name="igdn2")(x)
        x = WinGateAttention(RGB_N, num_heads=8, window_size=8, shift_size=4,
                             policy=p, name="attention2")(x, md2)
        x = ConvTranspose(RGB_N, 5, 2, policy=p, name="x3")(x)
        x = GDN(inverse=True, policy=p, name="igdn3")(x)
        x = ConvTranspose(3, 5, 2, policy=p, name="x4")(x)
        x = DSE(in_ch=3, policy=p, name="dse")(x)
        return x


class RGBCodec(nn.Module):
    policy: Policy = DEFAULT_POLICY
    # serving/eval: skip coding latent cells whose /8 recon-mask pool is
    # exactly 0 (y_hat pinned to mu+lrp there, zero bits).  The gate is a
    # function of the DECODED alpha, so the real codec derives the same
    # gate on both sides (eval/codec_io.py rate_gate).  Off in training.
    rate_gate: bool = False
    # batch-leading NamedSharding for the entropy head's hyper tensors on
    # a multi-chip mesh (see ChannelARPrior.data_sharding); None = no-op
    prior_sharding: Any = None

    def setup(self):
        self.encoder = AnalysisTransform(policy=self.policy)
        self.decoder = SynthesisTransform(policy=self.policy)
        self.prior = ChannelARPrior(latent_channels=RGB_M, num_slices=10,
                                    policy=self.policy,
                                    data_sharding=self.prior_sharding)

    def __call__(self, x, mask, reconmask, me_pyr: Tuple, training: bool = False):
        """x: (B,H,W,3) pre-masked RGB; mask: GT alpha (B,H,W,1);
        reconmask: decoded alpha used for gating; me_pyr: encoder mask
        pyramid built from the GT mask (trainRGB.py:175).

        Returns dict(x_hat, mse_loss, bpp, bpp_y, bpp_z) — the 5-tuple of
        AutoEncoderRGB_Journal.py:296.
        """
        b, h, w, _ = x.shape
        # 8-bit re-rounding of the recon mask inside forward (:211-214)
        reconmask = jnp.round(reconmask * 255.0) / 255.0
        md_pyr = mask_pyramid(reconmask)

        me2, me3 = me_pyr[1], me_pyr[2]
        md2, md3 = md_pyr[1], md_pyr[2]

        y = self.encoder(self.policy.cast_in(x), me2, me3)
        gate = None
        if self.rate_gate and not training:
            gate = (md_pyr[2] > 0).astype(jnp.float32)
        ent = self.prior(y, training=training, gate=gate)
        x_hat = self.decoder(ent["y_hat"].astype(self.policy.compute_dtype),
                             md2, md3)
        x_hat = x_hat.astype(jnp.float32)

        mse_loss = reconstruct_error(x.astype(jnp.float32), x_hat, mask)
        bpp_y = bpp_of(ent["y_likelihoods"], b, h, w)
        bpp_z = bpp_of(ent["z_likelihoods"], b, h, w)
        return {
            "x_hat": x_hat,
            "mse_loss": mse_loss,
            "bpp": bpp_y + bpp_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
            "y_hat": ent["y_hat"],
        }

    # pieces used by the real-bitstream codec (compress/decompress drivers)
    def encode_latent(self, x, me2, me3):
        return self.encoder(self.policy.cast_in(x), me2, me3)

    def decode_latent(self, y_hat, md2, md3):
        return self.decoder(y_hat.astype(self.policy.compute_dtype),
                            md2, md3).astype(jnp.float32)

    def aux_loss(self):
        return self.prior.aux_loss()
