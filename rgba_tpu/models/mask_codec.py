"""Alpha-matte (mask) codec.

Reference: models/AutoEncoderMask_Journal.py:147-316.
Encoder  (:153-163): 3 x (conv5x5 s2 + GDN) with SimplifiedAttention after
stage 2, 1x1 conv to M=80, SimplifiedAttention.
Decoder  (:165-176): mirror with IGDN + DSE(LeakyReLU) enhancement tail.
Entropy  (:178-246): hyperprior + 5-slice channel-AR head (ChannelARPrior).
Loss     (:302-315): plain MSE + clamped bpp.

The reference implements no compress()/decompress() for this codec (file
ends at forward, SURVEY §3.4) — ours adds a real bitstream path so a full
RGBA file can be produced (capability upgrade; eval parity keeps the
likelihood-estimated mask bpp of trainmask.py:258-271).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY
from ..entropy.rate import bpp as bpp_of
from ..ops.attention import SimplifiedAttention
from ..ops.conv import Conv, ConvTranspose
from ..ops.enhance import DSE
from ..ops.gdn import GDN
from .hyperprior import ChannelARPrior

MASK_N = 192
MASK_M = 80


class MaskEncoder(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        p = self.policy
        x = Conv(MASK_N, 5, 2, policy=p, name="conv0")(x)
        x = GDN(policy=p, name="gdn1")(x)
        x = Conv(MASK_N, 5, 2, policy=p, name="conv2")(x)
        x = GDN(policy=p, name="gdn3")(x)
        x = SimplifiedAttention(MASK_N, policy=p, name="attn4")(x)
        x = Conv(MASK_N, 5, 2, policy=p, name="conv5")(x)
        x = GDN(policy=p, name="gdn6")(x)
        x = Conv(MASK_M, 1, 1, policy=p, name="conv7")(x)
        x = SimplifiedAttention(MASK_M, policy=p, name="attn8")(x)
        return x


class MaskDecoder(nn.Module):
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, y_hat):
        p = self.policy
        x = SimplifiedAttention(MASK_M, policy=p, name="attn0")(y_hat)
        x = ConvTranspose(MASK_N, 1, 1, padding=0, output_padding=0,
                          policy=p, name="deconv1")(x)
        x = GDN(inverse=True, policy=p, name="igdn2")(x)
        x = ConvTranspose(MASK_N, 5, 2, policy=p, name="deconv3")(x)
        x = GDN(inverse=True, policy=p, name="igdn4")(x)
        x = SimplifiedAttention(MASK_N, policy=p, name="attn5")(x)
        x = ConvTranspose(MASK_N, 5, 2, policy=p, name="deconv6")(x)
        x = GDN(inverse=True, policy=p, name="igdn7")(x)
        x = ConvTranspose(1, 5, 2, policy=p, name="deconv8")(x)
        x = DSE(in_ch=1, leaky=True, policy=p, name="dse9")(x)
        return x


class MaskCodec(nn.Module):
    policy: Policy = DEFAULT_POLICY
    # batch-leading NamedSharding for the entropy head's hyper tensors on
    # a multi-chip mesh (see ChannelARPrior.data_sharding); None = no-op
    prior_sharding: Any = None

    def setup(self):
        self.encoder = MaskEncoder(policy=self.policy)
        self.decoder = MaskDecoder(policy=self.policy)
        self.prior = ChannelARPrior(latent_channels=MASK_M, num_slices=5,
                                    policy=self.policy,
                                    data_sharding=self.prior_sharding)

    def __call__(self, mask, training: bool = False):
        """mask: (B, H, W, 1) in [0, 1].

        Returns dict(x_hat, mse_loss, bpp, bpp_y, bpp_z) — the 5-tuple of
        AutoEncoderMask_Journal.py:316.
        """
        b, h, w, _ = mask.shape
        y = self.encoder(self.policy.cast_in(mask))
        ent = self.prior(y, training=training)
        x_hat = self.decoder(ent["y_hat"].astype(self.policy.compute_dtype))
        x_hat = x_hat.astype(jnp.float32)
        mse_loss = jnp.mean(jnp.square(x_hat - mask.astype(jnp.float32)))
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

    def encode_latent(self, mask):
        return self.encoder(self.policy.cast_in(mask))

    def decode_latent(self, y_hat):
        return self.decoder(y_hat.astype(self.policy.compute_dtype)).astype(jnp.float32)

    def aux_loss(self):
        return self.prior.aux_loss()
