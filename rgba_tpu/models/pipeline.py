"""Joint RGBA evaluation pipeline: mask codec -> cleanup -> RGB codec.

This is the metric-producing eval path of testKodak (trainRGB.py:258-317):
  1. pyramid of the GT mask for the encoder (:282)
  2. mask codec forward, clamp to [0,1], 8-bit round, constraint() (:284-287)
  3. RGB codec forward gated by the recon mask, clamp (:289-290)
  4. bpp = bpp_rgb (+ bpp_mask unless the mask is all-ones, :299-302)
  5. PSNR from masked MSE (:305)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import Policy, DEFAULT_POLICY
from ..ops.mask_pyramid import mask_pyramid
from ..ops.morphology import constraint_rgb
from .mask_codec import MaskCodec
from .rgb_codec import RGBCodec


class RGBAPipeline(nn.Module):
    """Bundles both codecs under one param tree: params/mask_codec,
    params/rgb_codec."""

    policy: Policy = DEFAULT_POLICY
    # alpha-rate gating of the RGB latent (see RGBCodec.rate_gate)
    rate_gate: bool = False

    def setup(self):
        self.mask_codec = MaskCodec(policy=self.policy)
        self.rgb_codec = RGBCodec(policy=self.policy,
                                  rate_gate=self.rate_gate)

    def __call__(self, masked_input, mask, training: bool = False):
        """Full RGBA forward. masked_input: (B,H,W,3); mask: (B,H,W,1)."""
        me_pyr = mask_pyramid(mask)
        m = self.mask_codec(mask, training=training)
        recon_mask = jnp.clip(m["x_hat"], 0.0, 1.0)
        recon_mask = jnp.round(recon_mask * 255.0) / 255.0
        recon_mask = constraint_rgb(recon_mask)
        r = self.rgb_codec(masked_input, mask, recon_mask, me_pyr,
                           training=training)
        x_hat = jnp.clip(r["x_hat"], 0.0, 1.0)

        # mask bpp only counts when the mask is not fully opaque
        # (trainRGB.py:299-302)
        opaque = jnp.all(mask == 1.0)
        bpp = r["bpp"] + jnp.where(opaque, 0.0, m["bpp"])
        return {
            "x_hat": x_hat,
            "recon_mask": recon_mask,
            "mse_loss": r["mse_loss"],
            "bpp": bpp,
            "bpp_rgb": r["bpp"],
            "bpp_mask": m["bpp"],
            "mse_mask": m["mse_loss"],
        }
