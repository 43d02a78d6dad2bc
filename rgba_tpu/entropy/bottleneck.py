"""Factorized-prior entropy bottleneck (Ballé et al. 2018, appendix 6.1).

JAX reimplementation of the learned univariate density the reference uses
for the hyper-latent z via `compressai.entropy_models.EntropyBottleneck`
(instantiated with 192 channels at models/AutoEncoderRGB_Journal.py:200 and
models/AutoEncoderMask_Journal.py:245; SURVEY §2.2 P1).

The per-channel CDF is a composition of K+1 monotone layers:
    logits_{k+1} = softplus(M_k) @ logits_k + b_k  [+ tanh(a_k)*tanh(...)]
Likelihood of an integer bin is CDF(v+0.5) - CDF(v-0.5), evaluated with the
numerically-stable sign trick.  ``quantiles`` (C,1,3) track the tail_mass
quantiles and the median; the median offsets STE rounding of z
(AutoEncoderRGB_Journal.py:227-229).  The reference driver never optimizes
the aux loss (no aux optimizer in trainRGB.py) so quantiles stay at init
there; our trainer exposes ``aux_loss`` with its own optimizer (config
``aux_lr``, set 0 for strict parity).

Entropy math is always fp32.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.math import lower_bound, ste_round

_LIKELIHOOD_BOUND = 1e-9


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        ch = self.channels
        filters = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        mats, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_v = math.log(math.expm1(1 / scale / filters[i + 1]))
            mats.append(self.param(
                f"matrix{i}",
                lambda k, s, v=init_v: jnp.full(s, v, jnp.float32),
                (ch, filters[i + 1], filters[i]),
            ))
            biases.append(self.param(
                f"bias{i}",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.5, 0.5),
                (ch, filters[i + 1], 1),
            ))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor{i}",
                    lambda k, s: jnp.zeros(s, jnp.float32),
                    (ch, filters[i + 1], 1),
                ))
        self._matrices = mats
        self._biases = biases
        self._factors = factors

        def q_init(key, shape):
            base = jnp.array([-self.init_scale, 0.0, self.init_scale],
                             jnp.float32)
            return jnp.tile(base.reshape(1, 1, 3), (shape[0], 1, 1))

        self.quantiles = self.param("quantiles", q_init, (ch, 1, 3))

    # ------------------------------------------------------------------ core

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        """inputs: (C, 1, N) -> logits of the cumulative at those points."""
        logits = inputs
        k = len(self.filters) + 1
        for i in range(k):
            m = self._matrices[i]
            b = self._biases[i]
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            logits = jnp.einsum("cof,cfn->con", jax.nn.softplus(m), logits) + b
            if i < len(self.filters):
                f = self._factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def _likelihood(self, v):
        """v: (C, 1, N) values (already centered however the caller wants)."""
        lower = self._logits_cumulative(v - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(v + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        likelihood = jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return likelihood

    def medians(self):
        return self.quantiles[:, 0, 1]

    def __call__(self, z, training: bool = False):
        """z: (B, H, W, C) fp32. Returns (z_hat_for_decode, likelihoods).

        Training: likelihoods of z + U(-.5,.5) noise (rng collection
        "noise"); z_hat is the STE-rounded value around the medians exactly
        as the reference computes it outside the entropy model
        (AutoEncoderRGB_Journal.py:227-229).
        Eval: likelihoods of round(z - median) + median.
        """
        z = z.astype(jnp.float32)
        b, h, w, c = z.shape
        med = self.medians().reshape(1, 1, 1, c)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), z.shape, jnp.float32, -0.5, 0.5)
            perturbed = z + noise
        else:
            perturbed = jnp.round(z - med) + med
        v = perturbed.transpose(3, 0, 1, 2).reshape(c, 1, -1)
        lik = self._likelihood(v)
        lik = lower_bound(lik, _LIKELIHOOD_BOUND)
        lik = lik.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        z_hat = ste_round(z - med) + med
        return z_hat, lik

    def aux_loss(self):
        """|logits_cumulative(quantiles) - target| summed; gradients flow to
        the quantiles only (compressai EntropyBottleneck.loss)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2 / self.tail_mass - 1)
        target = jnp.array([-t, 0.0, t], jnp.float32).reshape(1, 1, 3)
        return jnp.sum(jnp.abs(logits - target))

    # ------------------------------------------------------- codec tables

    def cdf_tables(self, params) -> dict:
        """Build integer CDF tables for the rANS coder from bound params.

        Called outside jit (host side). `params` is this module's param dict
        (as stored in the model's param tree). Returns dict with
        quantized_cdfs (C, L), cdf_lengths (C,), offsets (C,).
        """
        def apply_fn(method):
            return self.apply({"params": params}, method=method)

        medians = np.asarray(apply_fn(lambda m: m.medians()))
        quantiles = np.asarray(params["quantiles"])
        minima = np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32)
        minima = np.maximum(minima, 0)
        maxima = np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32)
        maxima = np.maximum(maxima, 0)
        pmf_start = medians - minima
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max())

        samples = np.arange(max_length, dtype=np.float32)
        samples = samples[None, :] + pmf_start[:, None]   # (C, L)
        c = self.channels
        v = jnp.asarray(samples.reshape(c, 1, -1))

        def lik_and_tails(m):
            lower = m._logits_cumulative(v - 0.5, stop_gradient=True)
            upper = m._logits_cumulative(v + 0.5, stop_gradient=True)
            sign = -jnp.sign(lower + upper)
            pmf = jnp.abs(jax.nn.sigmoid(sign * upper) -
                          jax.nn.sigmoid(sign * lower))
            tail = (jax.nn.sigmoid(lower[:, 0, :1]) +
                    jax.nn.sigmoid(-upper[:, 0, -1:]))
            return pmf[:, 0, :], tail[:, 0]

        pmf, tail = jax.tree_util.tree_map(
            np.asarray, apply_fn(lik_and_tails))

        from .cdf import build_cdf_rows
        cdfs, cdf_lengths = build_cdf_rows(pmf, pmf_length, tail)
        return {
            "quantized_cdfs": cdfs,
            "cdf_lengths": cdf_lengths,
            "offsets": -minima,
            "medians": medians,
            "pmf_length": pmf_length,
        }
