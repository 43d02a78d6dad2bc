"""PMF -> quantized integer CDF for the rANS range coder.

This is the standard 16-bit CDF quantization used by learned-compression
codecs (reference depends on compressai's C++ `_CXX.pmf_to_quantized_cdf`,
see SURVEY §2.2 N2): scale the pmf to 2^precision, renormalize exactly, and
steal one unit of probability mass from the smallest range with freq > 1 to
eliminate zero-frequency entries so every symbol stays decodable (matches
CompressAI's steal-from-poorest choice so tables are bit-identical).

A C++ implementation lives in rgba_tpu/native (used when built); this numpy
version is the always-available fallback and the golden model for tests.
"""

from __future__ import annotations

import numpy as np


def pmf_to_quantized_cdf_py(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """pmf: 1-D float array (should include any tail mass as the last entry).

    Returns uint32 cdf of length len(pmf)+1 with cdf[0]=0,
    cdf[-1]=2^precision, and strictly increasing entries.
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    if (pmf < 0).any() or not np.isfinite(pmf).all():
        raise ValueError("pmf must be finite and non-negative")
    n = pmf.shape[0]
    cdf = np.zeros(n + 1, dtype=np.uint64)
    cdf[1:] = np.round(pmf * (1 << precision)).astype(np.uint64)
    total = int(cdf.sum())
    if total == 0:
        raise ValueError("pmf is all-zero")
    cdf = ((np.uint64(1 << precision) * cdf) // np.uint64(total)).astype(np.uint64)
    cdf = np.cumsum(cdf, dtype=np.uint64)
    cdf[-1] = 1 << precision

    # eliminate zero-frequency symbols by stealing from the poorest
    # freq>1 range (CompressAI's choice — keeps tables bit-identical)
    cdf = cdf.astype(np.int64)
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            freqs = cdf[1:] - cdf[:-1]
            candidates = np.where(freqs > 1)[0]
            if candidates.size == 0:
                raise ValueError("cannot renormalize pmf: too many symbols")
            best = candidates[np.argmin(freqs[candidates])]
            if best < i:
                cdf[best + 1:i + 1] -= 1
            else:
                cdf[i + 1:best + 1] += 1
    assert cdf[0] == 0 and cdf[-1] == (1 << precision)
    assert (np.diff(cdf) > 0).all()
    return cdf.astype(np.uint32)


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Native C++ implementation when available, numpy fallback otherwise."""
    try:
        from ..native import rans as _native
        if _native.available():
            return _native.pmf_to_quantized_cdf(pmf, precision)
    except ImportError:
        pass
    return pmf_to_quantized_cdf_py(pmf, precision)


def build_cdf_rows(pmfs: np.ndarray, lengths: np.ndarray,
                   tail_masses: np.ndarray, precision: int = 16):
    """Pack per-row [pmf_row[:len] + tail] CDFs into one padded int32 matrix.

    pmfs: (R, Lmax); lengths: (R,) valid pmf lengths; tail_masses: (R,)
    Returns (cdfs int32 (R, Lmax+2), cdf_lengths int32 (R,)).
    """
    rows, lmax = pmfs.shape
    cdfs = np.zeros((rows, lmax + 2), dtype=np.int32)
    cdf_lengths = np.zeros(rows, dtype=np.int32)
    for r in range(rows):
        ln = int(lengths[r])
        prob = np.concatenate([pmfs[r, :ln], [max(tail_masses[r], 0.0)]])
        c = pmf_to_quantized_cdf(prob, precision)
        cdfs[r, :len(c)] = c
        cdf_lengths[r] = len(c)
    return cdfs, cdf_lengths
