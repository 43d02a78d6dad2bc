"""Real bitstream encode/decode for both codecs (host/device split).

Mirrors AutoEncoder.compress/decompress (AutoEncoderRGB_Journal.py:312-415)
with the TPU-native division of labour designed in SURVEY §3.4:

  * device (jit): analysis transform, hyper encode/decode, per-slice
    (mu, sigma) convs, symbol quantization, index building — everything
    tensor-shaped, produced as int32 arrays in as few passes as possible
    (compress is ONE jitted pass; decompress needs one device pass per
    slice because the decoded symbols feed the next slice's convs).
  * host (C++ rANS): byte-stream encode/decode with 16-bit quantized CDFs.

The mask codec gets the same treatment (capability upgrade — the reference
never implemented its bitstream, AutoEncoderMask_Journal.py ends at
forward).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.gaussian import GaussianConditional, get_scale_table
from ..native import rans
from ..ops.mask_pyramid import mask_pyramid


class CodecIO:
    """Wraps a codec model (+params) with entropy tables and jitted passes.

    kind: "rgb" or "mask".
    """

    def __init__(self, model, params, kind: str = "rgb"):
        self.model = model
        self.params = params
        self.kind = kind
        self.num_slices = 10 if kind == "rgb" else 5
        self.gc = GaussianConditional(get_scale_table())
        self.gc.update()
        self.eb_tables = self._build_eb_tables()

    # ------------------------------------------------------------ tables

    def _build_eb_tables(self):
        from ..entropy.bottleneck import EntropyBottleneck
        eb_mod = EntropyBottleneck(192)
        return eb_mod.cdf_tables(self.params["prior"]["entropy_bottleneck"])

    # ------------------------------------------------------- device fns

    @functools.cached_property
    def _compress_fn(self):
        model = self.model
        kind = self.kind
        build_indexes = self.gc.build_indexes

        def run(params, *args):
            def inner(m):
                if kind == "rgb":
                    x, mask, me2, me3 = args
                    y = m.encoder(m.policy.cast_in(x), me2, me3)
                else:
                    (mask_in,) = args
                    y = m.encoder(m.policy.cast_in(mask_in))
                y = y.astype(jnp.float32)
                b, h, w, mch = y.shape
                z = m.prior.h_a(y).astype(jnp.float32)
                medians = m.prior.entropy_bottleneck.medians()
                z_sym = jnp.round(z - medians[None, None, None, :])
                z_hat = z_sym + medians[None, None, None, :]
                lm, ls = m.prior.hyper_decode(z_hat)
                lm = lm.astype(jnp.float32)
                ls = ls.astype(jnp.float32)

                sw = mch // m.prior.num_slices
                y_hat_slices = []
                sym_list, idx_list = [], []
                for i in range(m.prior.num_slices):
                    y_slice = y[..., i * sw:(i + 1) * sw]
                    support = y_hat_slices[:m.prior.max_support_slices]
                    mu, scale = m.prior.slice_stats(lm, ls, support, i, (h, w))
                    index = build_indexes(scale)
                    sym = jnp.round(y_slice - mu)
                    y_hat = sym + mu
                    y_hat = y_hat + m.prior.slice_lrp(lm, support, y_hat, i)
                    y_hat_slices.append(y_hat)
                    sym_list.append(sym.astype(jnp.int32))
                    idx_list.append(index)
                y_hat_full = jnp.concatenate(y_hat_slices, axis=-1)
                return (jnp.stack(sym_list), jnp.stack(idx_list),
                        z_sym.astype(jnp.int32), y_hat_full, z.shape)

            return model.apply({"params": params}, method=inner)

        return jax.jit(run)

    @functools.cached_property
    def _hyper_decode_fn(self):
        model = self.model

        def run(params, z_hat):
            def inner(m):
                lm, ls = m.prior.hyper_decode(z_hat)
                return lm.astype(jnp.float32), ls.astype(jnp.float32)
            return model.apply({"params": params}, method=inner)

        return jax.jit(run)

    @functools.cached_property
    def _slice_stats_fns(self):
        model = self.model
        fns = []
        for i in range(self.num_slices):
            def run(params, lm, ls, support, i=i):
                def inner(m):
                    h, w = lm.shape[1], lm.shape[2]
                    mu, scale = m.prior.slice_stats(lm, ls, list(support), i,
                                                    (h, w))
                    index = self.gc.build_indexes(scale)
                    return mu, index
                return model.apply({"params": params}, method=inner)
            fns.append(jax.jit(run))
        return fns

    @functools.cached_property
    def _slice_finish_fns(self):
        model = self.model
        fns = []
        for i in range(self.num_slices):
            def run(params, lm, support, sym, mu, i=i):
                def inner(m):
                    y_hat = sym.astype(jnp.float32) + mu
                    y_hat = y_hat + m.prior.slice_lrp(lm, list(support),
                                                      y_hat, i)
                    return y_hat
                return model.apply({"params": params}, method=inner)
            fns.append(jax.jit(run))
        return fns

    @functools.cached_property
    def _decode_image_fn(self):
        model = self.model
        kind = self.kind

        def run(params, y_hat, *args):
            def inner(m):
                if kind == "rgb":
                    md2, md3 = args
                    x = m.decoder(y_hat.astype(m.policy.compute_dtype),
                                  md2, md3)
                else:
                    x = m.decoder(y_hat.astype(m.policy.compute_dtype))
                return jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
            return model.apply({"params": params}, method=inner)

        return jax.jit(run)

    # ----------------------------------------------------------- public

    def compress(self, image: Optional[np.ndarray] = None,
                 mask: Optional[np.ndarray] = None) -> dict:
        """RGB: compress(image, mask) — mask is the (recon) alpha used for
        gating, per compress() in the reference which uses the GT mask and
        its pyramid (:314-315). Mask codec: compress(mask=alpha)."""
        if self.kind == "rgb":
            assert image.shape[0] == 1, "compress expects batch 1 (per-image)"
            me = mask_pyramid(jnp.asarray(mask))
            args = (jnp.asarray(image), jnp.asarray(mask), me[1], me[2])
        else:
            assert mask.shape[0] == 1, "compress expects batch 1 (per-image)"
            args = (jnp.asarray(mask),)
        y_syms, y_idxs, z_sym, _, z_shape = jax.device_get(
            self._compress_fn(self.params, *args))

        t = self.eb_tables
        c = z_sym.shape[-1]
        z_indexes = np.broadcast_to(
            np.arange(c, dtype=np.int32), z_sym.shape)
        z_string = rans.encode_with_indexes(
            z_sym.ravel(), z_indexes.ravel(),
            t["quantized_cdfs"], t["cdf_lengths"], t["offsets"])

        y_string = rans.encode_with_indexes(
            y_syms.ravel(), y_idxs.ravel(),
            self.gc.quantized_cdfs, self.gc.cdf_lengths, self.gc.offsets)

        return {
            "strings": [y_string, z_string],
            "shape": tuple(int(s) for s in z_shape[1:3]),
        }

    def decompress(self, compressed: dict,
                   mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Reconstruct the image (RGB) or alpha (mask) from byte strings."""
        y_string, z_string = compressed["strings"]
        zh, zw = compressed["shape"]
        t = self.eb_tables
        c = t["quantized_cdfs"].shape[0]
        z_indexes = np.broadcast_to(np.arange(c, dtype=np.int32),
                                    (1, zh, zw, c))
        z_sym = rans.decode_with_indexes(
            z_string, z_indexes, t["quantized_cdfs"], t["cdf_lengths"],
            t["offsets"]).astype(np.float32)
        z_hat = jnp.asarray(z_sym + t["medians"][None, None, None, :])

        lm, ls = self._hyper_decode_fn(self.params, z_hat)
        dec = rans.RansDecoder(y_string)
        support: List = []
        y_hat_slices: List = []
        for i in range(self.num_slices):
            sup = tuple(y_hat_slices[:5])
            mu, index = self._slice_stats_fns[i](self.params, lm, ls, sup)
            idx_np = jax.device_get(index)
            sym = dec.decode_stream(idx_np, self.gc.quantized_cdfs,
                                    self.gc.cdf_lengths, self.gc.offsets)
            y_hat = self._slice_finish_fns[i](
                self.params, lm, sup, jnp.asarray(sym), mu)
            y_hat_slices.append(y_hat)
        dec.close()
        y_hat = jnp.concatenate(y_hat_slices, axis=-1)

        if self.kind == "rgb":
            md = mask_pyramid(jnp.asarray(mask))
            x_hat = self._decode_image_fn(self.params, y_hat, md[1], md[2])
        else:
            x_hat = self._decode_image_fn(self.params, y_hat)
        return np.asarray(jax.device_get(x_hat))
