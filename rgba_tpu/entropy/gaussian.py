"""Conditional Gaussian entropy model over the y-latent slices.

JAX reimplementation of `compressai.entropy_models.GaussianConditional`
(instantiated with a lazy scale table at models/AutoEncoderRGB_Journal.py:201;
SURVEY §2.2 P2).  Stateless — scales are lower-bounded at SCALE_BOUND with
the gradient-gated lower_bound, likelihoods are the integer-bin mass of a
Gaussian, and the 64-entry log-spaced scale table (0.11 -> 256,
AutoEncoderRGB_Journal.py:28-34) quantizes scales to CDF rows for coding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import lower_bound

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
SCALE_BOUND = 0.11
_LIKELIHOOD_BOUND = 1e-9


def get_scale_table(minimum=SCALES_MIN, maximum=SCALES_MAX,
                    levels=SCALES_LEVELS) -> np.ndarray:
    """exp(linspace(log min, log max, levels)) — AutoEncoderRGB_Journal.py:33-34."""
    return np.exp(np.linspace(math.log(minimum), math.log(maximum), levels))


def _std_cumulative(x):
    """Standard normal CDF via erfc: 0.5 * erfc(-x / sqrt(2))."""
    return 0.5 * jax.lax.erfc(-x * (2 ** -0.5))


class GaussianConditional:
    """Functional port — no learned parameters, so a plain class, not a
    flax module. All math fp32."""

    def __init__(self, scale_table=None, scale_bound: float = SCALE_BOUND,
                 tail_mass: float = 1e-9):
        self.scale_table = None if scale_table is None else np.asarray(scale_table)
        self.scale_bound = scale_bound
        self.tail_mass = tail_mass

    # ------------------------------------------------------------- training

    def likelihood(self, y, scales, means, training: bool = False, rng=None):
        """Per-element integer-bin likelihood.

        Training: of y + U(-0.5, 0.5) (additive-noise relaxation).
        Eval:     of round(y - means) (the value the decoder will see).
        """
        y = y.astype(jnp.float32)
        scales = lower_bound(scales.astype(jnp.float32), self.scale_bound)
        means = means.astype(jnp.float32)
        if training:
            if rng is None:
                raise ValueError("training likelihood needs an rng")
            values = y - means + jax.random.uniform(
                rng, y.shape, jnp.float32, -0.5, 0.5)
        else:
            values = jnp.round(y - means)
        v = jnp.abs(values)
        upper = _std_cumulative((0.5 - v) / scales)
        lower = _std_cumulative((-0.5 - v) / scales)
        return lower_bound(upper - lower, _LIKELIHOOD_BOUND)

    # ---------------------------------------------------------------- codec

    def build_indexes(self, scales):
        """Map each scale to its CDF row: the smallest table entry >= scale
        (compressai GaussianConditional.build_indexes)."""
        if self.scale_table is None:
            raise ValueError("scale table not set — call update() first")
        scales = jnp.maximum(scales.astype(jnp.float32), self.scale_bound)
        table = jnp.asarray(self.scale_table[:-1], jnp.float32)
        return jnp.sum(scales[..., None] > table, axis=-1).astype(jnp.int32)

    @staticmethod
    def quantize_symbols(y, means):
        return jnp.round(y - means).astype(jnp.int32)

    @staticmethod
    def dequantize(symbols, means):
        return symbols.astype(jnp.float32) + means.astype(jnp.float32)

    def update(self, scale_table=None):
        """Build quantized CDF tables for every scale in the table
        (compressai GaussianConditional.update; SURVEY §3.4)."""
        if scale_table is not None:
            self.scale_table = np.asarray(scale_table)
        if self.scale_table is None:
            self.scale_table = get_scale_table()
        st = self.scale_table.astype(np.float64)
        erfc = np.vectorize(math.erfc)  # no scipy dependency

        multiplier = -self._std_quantile(self.tail_mass / 2)
        pmf_center = np.ceil(st * multiplier).astype(np.int64)
        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())

        samples = np.abs(np.arange(max_length)[None, :] - pmf_center[:, None])
        upper = 0.5 * erfc(-((0.5 - samples) / st[:, None]) * (2 ** -0.5))
        lower = 0.5 * erfc(-((-0.5 - samples) / st[:, None]) * (2 ** -0.5))
        pmf = (upper - lower).astype(np.float32)
        tail_mass = (2.0 * lower[:, :1])[:, 0].astype(np.float32)

        from .cdf import build_cdf_rows
        cdfs, cdf_lengths = build_cdf_rows(pmf, pmf_length, tail_mass)
        self.quantized_cdfs = cdfs
        self.cdf_lengths = cdf_lengths
        self.offsets = (-pmf_center).astype(np.int32)
        return True

    @staticmethod
    def _std_quantile(p: float) -> float:
        """Inverse standard-normal CDF (Acklam's rational approximation —
        sufficient: only sets the integer tail truncation radius)."""
        # Peter Acklam's algorithm, max rel. error ~1.15e-9.
        a = [-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00]
        b = [-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01]
        c = [-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00]
        d = [7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00]
        plow = 0.02425
        if p < plow:
            q = math.sqrt(-2 * math.log(p))
            return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
                   ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
        if p > 1 - plow:
            return -GaussianConditional._std_quantile(1 - p)
        q = p - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
               (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
