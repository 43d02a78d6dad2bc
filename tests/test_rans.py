"""Bit-exact round-trip tests for the native rANS coder."""

import math

import numpy as np
import pytest

from rgba_tpu.native import rans
from rgba_tpu.entropy.cdf import pmf_to_quantized_cdf_py
from rgba_tpu.entropy.gaussian import GaussianConditional, get_scale_table

pytestmark = pytest.mark.skipif(not rans.available(),
                                reason="native rans not built")


def _gaussian_tables():
    gc = GaussianConditional(get_scale_table())
    gc.update()
    return gc


def test_native_cdf_matches_python():
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = rng.randint(2, 100)
        pmf = rng.dirichlet(np.ones(n)).astype(np.float32)
        c_native = rans.pmf_to_quantized_cdf(pmf, 16)
        c_py = pmf_to_quantized_cdf_py(pmf, 16)
        np.testing.assert_array_equal(c_native, c_py)


def test_roundtrip_simple():
    # 1 row, 4 symbols + tail
    pmf = np.array([0.4, 0.3, 0.2, 0.1, 1e-9], np.float32)
    cdf = rans.pmf_to_quantized_cdf(pmf, 16).astype(np.int32)
    cdfs = cdf[None, :]
    lengths = np.array([len(cdf)], np.int32)
    offsets = np.array([0], np.int32)
    rng = np.random.RandomState(1)
    symbols = rng.randint(0, 4, size=1000).astype(np.int32)
    indexes = np.zeros(1000, np.int32)
    data = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    decoded = rans.decode_with_indexes(data, indexes, cdfs, lengths, offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_roundtrip_gaussian_tables_with_bypass():
    gc = _gaussian_tables()
    rng = np.random.RandomState(2)
    n = 5000
    indexes = rng.randint(0, len(gc.scale_table), size=n).astype(np.int32)
    # symbols drawn wide enough to trigger bypass escapes on small scales
    symbols = rng.randint(-300, 301, size=n).astype(np.int32)
    data = rans.encode_with_indexes(symbols, indexes, gc.quantized_cdfs,
                                    gc.cdf_lengths, gc.offsets)
    decoded = rans.decode_with_indexes(data, indexes, gc.quantized_cdfs,
                                       gc.cdf_lengths, gc.offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_streaming_decoder_slices():
    """Interleaved decode: one stream encoded in slice order, decoded
    slice-by-slice (the channel-AR decompress pattern)."""
    gc = _gaussian_tables()
    rng = np.random.RandomState(3)
    slices = []
    for s in range(10):
        n = 256
        idx = rng.randint(0, 64, size=n).astype(np.int32)
        sym = rng.randint(-40, 41, size=n).astype(np.int32)
        slices.append((sym, idx))
    all_sym = np.concatenate([s for s, _ in slices])
    all_idx = np.concatenate([i for _, i in slices])
    data = rans.encode_with_indexes(all_sym, all_idx, gc.quantized_cdfs,
                                    gc.cdf_lengths, gc.offsets)
    dec = rans.RansDecoder(data)
    for sym, idx in slices:
        out = dec.decode_stream(idx, gc.quantized_cdfs, gc.cdf_lengths,
                                gc.offsets)
        np.testing.assert_array_equal(out, sym)
    dec.close()


def test_rate_close_to_entropy():
    """Coded size should be within a few percent of the CDF entropy."""
    pmf = np.array([0.5, 0.25, 0.125, 0.125, 1e-9], np.float32)
    cdf = rans.pmf_to_quantized_cdf(pmf, 16).astype(np.int32)
    cdfs = cdf[None, :]
    lengths = np.array([len(cdf)], np.int32)
    offsets = np.array([0], np.int32)
    rng = np.random.RandomState(4)
    n = 100_000
    symbols = rng.choice(4, p=pmf[:4] / pmf[:4].sum(), size=n).astype(np.int32)
    indexes = np.zeros(n, np.int32)
    data = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    h = -sum(p * math.log2(p) for p in pmf[:4])          # 1.75 bits
    actual_bits = len(data) * 8 / n
    assert actual_bits < h * 1.02 + 0.01
