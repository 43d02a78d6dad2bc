"""Device (lax.scan) rANS lane decoder vs the C++ coder.

Three-ended pin: C++ rans32_encode_lanes -> (a) C++ rans32_decode_lanes
and (b) the jit device decoder must both reproduce the symbols exactly,
including bypass escapes, masked (rate-gated) positions, multi-segment
streams, and lane-tail padding.  The device decoder is what removes the
per-slice host round trips from the AR decode (entropy/device_rans.py);
reference analog: compressai's host RansDecoder consumed per slice at
AutoEncoderRGB_Journal.py:390-410.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.entropy import device_rans as dr
from rgba_tpu.entropy.gaussian import GaussianConditional, get_scale_table
from rgba_tpu.native import rans

pytestmark = pytest.mark.skipif(not rans.available(),
                                reason="native rans unavailable")


@pytest.fixture(scope="module")
def gauss_tables():
    gc = GaussianConditional(get_scale_table())
    gc.update()
    return gc.quantized_cdfs, gc.cdf_lengths, gc.offsets


def _random_payload(rng, n, rows, extreme_every=53):
    idx = rng.randint(0, rows, size=n).astype(np.int32)
    sym = rng.randint(-25, 26, size=n).astype(np.int32)
    sym[::extreme_every] = rng.randint(-900, 900,
                                       size=sym[::extreme_every].size)
    return sym, idx


def _device_decode(tables_np, words, lane_nwords, idx, seg_ends, lanes,
                   alive=None, inverse=None):
    """Drive decode_segment across segments exactly as CodecIO will."""
    flat_words, lane_base = dr.pack_streams([(words, lane_nwords)], lanes)
    words_d = jnp.asarray(flat_words.astype(np.int32))
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
    if inverse is not None:
        inverse = {k: jnp.asarray(v) for k, v in inverse.items()}
    state, ptr = dr.init_lanes(words_d, jnp.asarray(lane_base[0]))
    outs = []
    start = 0
    for end in seg_ends:
        seg_idx = idx[start:end]
        seg_alive = (np.ones(end - start, bool) if alive is None
                     else alive[start:end])
        n = end - start
        idx_steps = dr.to_steps(jnp.asarray(seg_idx)[None], lanes)[:, 0]
        act_steps = dr.to_steps(
            jnp.asarray(seg_alive)[None], lanes, fill=False)[:, 0]
        syms, state, ptr = dr.decode_segment(
            tables, words_d, state, ptr, idx_steps, act_steps,
            inverse=inverse)
        outs.append(np.asarray(dr.from_steps(syms[:, None], n))[0])
        start = end
    return np.concatenate(outs)


@pytest.mark.parametrize("lanes", [8, 64])
def test_inverse_table_fast_path_bit_exact(gauss_tables, lanes):
    """The dense-inverse decode path (one gather instead of the row
    search) reproduces the row-search path and the symbols exactly."""
    cdfs, lens, offs = gauss_tables
    rng = np.random.RandomState(lanes)
    n = 2500
    sym, idx = _random_payload(rng, n, cdfs.shape[0], extreme_every=17)
    seg_ends = np.array([900, n], dtype=np.int64)
    words, lnw = rans.encode_lanes(sym, idx, seg_ends, lanes, cdfs, lens,
                                   offs)
    tables = dr.pack_tables(cdfs, lens, offs)
    inverse = dr.build_inverse(cdfs, lens)
    slow = _device_decode(tables, words, lnw, idx, seg_ends, lanes)
    fast = _device_decode(tables, words, lnw, idx, seg_ends, lanes,
                          inverse=inverse)
    np.testing.assert_array_equal(slow, sym)
    np.testing.assert_array_equal(fast, sym)


@pytest.mark.parametrize("lanes", [1, 5, 64, 128])
def test_lane_roundtrip_three_ended(gauss_tables, lanes):
    cdfs, lens, offs = gauss_tables
    rng = np.random.RandomState(lanes)
    n = 4000
    sym, idx = _random_payload(rng, n, cdfs.shape[0])
    seg_ends = np.array([700, 701, 2400, n], dtype=np.int64)

    words, lnw = rans.encode_lanes(sym, idx, seg_ends, lanes, cdfs, lens,
                                   offs)
    host = rans.decode_lanes(words, lnw, idx, seg_ends, cdfs, lens, offs)
    np.testing.assert_array_equal(host, sym)

    tables = dr.pack_tables(cdfs, lens, offs)
    dev = _device_decode(tables, words, lnw, idx, seg_ends, lanes)
    np.testing.assert_array_equal(dev, sym)


def test_lane_roundtrip_gated(gauss_tables):
    cdfs, lens, offs = gauss_tables
    rng = np.random.RandomState(7)
    n, lanes = 3000, 32
    sym, idx = _random_payload(rng, n, cdfs.shape[0])
    alive = rng.rand(n) > 0.45
    seg_ends = np.array([1000, n], dtype=np.int64)

    words, lnw = rans.encode_lanes(sym, idx, seg_ends, lanes, cdfs, lens,
                                   offs, alive=alive)
    expected = np.where(alive, sym, 0)
    host = rans.decode_lanes(words, lnw, idx, seg_ends, cdfs, lens, offs,
                             alive=alive)
    np.testing.assert_array_equal(host, expected)

    tables = dr.pack_tables(cdfs, lens, offs)
    dev = _device_decode(tables, words, lnw, idx, seg_ends, lanes,
                         alive=alive)
    np.testing.assert_array_equal(dev, expected)


def test_empty_lane_and_tiny_segments(gauss_tables):
    """Lanes with zero symbols (n < L) still carry flush words and
    decode cleanly; segment of size 1 restarts lane striding."""
    cdfs, lens, offs = gauss_tables
    rng = np.random.RandomState(3)
    n, lanes = 10, 64
    sym, idx = _random_payload(rng, n, cdfs.shape[0], extreme_every=3)
    seg_ends = np.array([1, 2, n], dtype=np.int64)
    words, lnw = rans.encode_lanes(sym, idx, seg_ends, lanes, cdfs, lens,
                                   offs)
    assert lnw.min() >= 2  # every lane has at least its flush words
    tables = dr.pack_tables(cdfs, lens, offs)
    dev = _device_decode(tables, words, lnw, idx, seg_ends, lanes)
    np.testing.assert_array_equal(dev, sym)


def test_merged_tables_and_buffer_pack(gauss_tables):
    """merge_tables + pack/unpack_table_buffer preserve both table sets
    (the z rows decode with their row offset applied)."""
    cdfs, lens, offs = gauss_tables
    g = dr.pack_tables(cdfs, lens, offs)
    # a small z-style table set (valid quantized CDFs via the native
    # builder) with different widths/offsets than the Gaussian rows
    rng0 = np.random.RandomState(5)
    z_lens = np.array([5, 9, 17], np.int32)
    z_cdfs = np.zeros((3, 17), np.int32)
    for r, ln in enumerate(z_lens):
        pmf = rng0.rand(ln - 1).astype(np.float32) + 0.05
        z_cdfs[r, :ln] = rans.pmf_to_quantized_cdf(
            pmf / pmf.sum(), 16).astype(np.int32)
    z = dr.pack_tables(z_cdfs, z_lens, np.array([-2, 0, 3], np.int32))
    merged = dr.merge_tables(g, z)
    buf, layout = dr.pack_table_buffer(merged)
    back = dr.unpack_table_buffer(jnp.asarray(buf), layout)
    off = merged["z_row_offset"]
    np.testing.assert_array_equal(np.asarray(back["cdfs"])[off + 1][:9],
                                  z_cdfs[1][:9])
    np.testing.assert_array_equal(np.asarray(back["offsets"])[:off],
                                  g["offsets"])

    # end-to-end: encode with merged row ids for both halves
    rng = np.random.RandomState(0)
    n, lanes = 800, 16
    sym_z = rng.randint(-2, 5, size=300).astype(np.int32)
    idx_z = rng.randint(0, 3, size=300).astype(np.int32) + off
    sym_y, idx_y = _random_payload(rng, n - 300, cdfs.shape[0])
    sym = np.concatenate([sym_z, sym_y])
    idx = np.concatenate([idx_z, idx_y])
    seg_ends = np.array([300, n], dtype=np.int64)
    m_cdfs = merged["cdfs"]
    m_lens = merged["max_values"] + 2
    m_offs = merged["offsets"]
    words, lnw = rans.encode_lanes(sym, idx, seg_ends, lanes, m_cdfs,
                                   m_lens, m_offs)
    dev = _device_decode(
        {"cdfs": merged["cdfs"], "max_values": merged["max_values"],
         "offsets": merged["offsets"]},
        words, lnw, idx, seg_ends, lanes)
    np.testing.assert_array_equal(dev, sym)


def _device_encode(tables_np, sym, idx, seg_ends, lanes, max_words,
                   alive=None):
    """Drive encode_segment across segments in reverse order (rANS
    encodes in reverse) exactly as CodecIO's device compress will."""
    tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
    state, wptr, out_words = dr.init_encode((), lanes, max_words)
    segs = []
    start = 0
    for end in seg_ends:
        seg_alive = (np.ones(end - start, bool) if alive is None
                     else alive[start:end])
        segs.append((idx[start:end], sym[start:end], seg_alive))
        start = end
    for seg_idx, seg_sym, seg_alive in reversed(segs):
        n = len(seg_idx)
        idx_steps = dr.to_steps(jnp.asarray(seg_idx)[None], lanes)[:, 0]
        sym_steps = dr.to_steps(jnp.asarray(seg_sym)[None], lanes)[:, 0]
        act_steps = dr.to_steps(
            jnp.asarray(seg_alive)[None], lanes, fill=False)[:, 0]
        state, wptr, out_words = dr.encode_segment(
            tables, state, wptr, out_words, idx_steps, sym_steps,
            act_steps)
    words, nwords, overflow = dr.finish_lanes(state, wptr, out_words)
    assert not bool(overflow)
    return np.asarray(words), np.asarray(nwords)


@pytest.mark.parametrize("lanes", [1, 16, 64])
def test_device_encode_bit_exact_vs_cpp(gauss_tables, lanes):
    """Device reverse-scan encode emits byte-identical lane streams to
    the C++ encoder (same renorm decisions, same bypass order)."""
    cdfs, lens, offs = gauss_tables
    rng = np.random.RandomState(100 + lanes)
    n = 3000
    sym, idx = _random_payload(rng, n, cdfs.shape[0])
    seg_ends = np.array([500, 501, 1700, n], dtype=np.int64)
    ref_words, ref_lnw = rans.encode_lanes(sym, idx, seg_ends, lanes,
                                           cdfs, lens, offs)
    tables = dr.pack_tables(cdfs, lens, offs)
    words, nwords = _device_encode(tables, sym, idx, seg_ends, lanes,
                                   max_words=4 * n // lanes + 64)
    np.testing.assert_array_equal(nwords, ref_lnw)
    off = 0
    for l in range(lanes):
        np.testing.assert_array_equal(
            words[l, :nwords[l]], ref_words[off:off + ref_lnw[l]],
            err_msg=f"lane {l}")
        off += ref_lnw[l]


def test_device_encode_gated_and_overflow(gauss_tables):
    cdfs, lens, offs = gauss_tables
    rng = np.random.RandomState(9)
    n, lanes = 1200, 8
    sym, idx = _random_payload(rng, n, cdfs.shape[0], extreme_every=11)
    alive = rng.rand(n) > 0.5
    seg_ends = np.array([n], dtype=np.int64)
    ref_words, ref_lnw = rans.encode_lanes(sym, idx, seg_ends, lanes,
                                           cdfs, lens, offs, alive=alive)
    tables = dr.pack_tables(cdfs, lens, offs)
    words, nwords = _device_encode(tables, sym, idx, seg_ends, lanes,
                                   max_words=n, alive=alive)
    np.testing.assert_array_equal(nwords, ref_lnw)
    flat = np.concatenate([words[l, :nwords[l]] for l in range(lanes)])
    np.testing.assert_array_equal(flat, ref_words)

    # overflow: a 2-word budget must flag, not corrupt silently
    tables_j = {k: jnp.asarray(v) for k, v in tables.items()}
    state, wptr, out_words = dr.init_encode((), lanes, 2)
    idx_steps = dr.to_steps(jnp.asarray(idx)[None], lanes)[:, 0]
    sym_steps = dr.to_steps(jnp.asarray(sym)[None], lanes)[:, 0]
    act = dr.to_steps(jnp.asarray(np.ones(n, bool))[None], lanes,
                      fill=False)[:, 0]
    state, wptr, out_words = dr.encode_segment(
        tables_j, state, wptr, out_words, idx_steps, sym_steps, act)
    _, _, overflow = dr.finish_lanes(state, wptr, out_words)
    assert bool(overflow)


def test_stream_serialization_roundtrip(gauss_tables):
    cdfs, lens, offs = gauss_tables
    rng = np.random.RandomState(11)
    sym, idx = _random_payload(rng, 500, cdfs.shape[0])
    seg_ends = np.array([500], dtype=np.int64)
    words, lnw = rans.encode_lanes(sym, idx, seg_ends, 8, cdfs, lens, offs)
    blob = dr.split_stream(words, lnw)
    words2, lnw2 = dr.parse_stream(blob, 8)
    np.testing.assert_array_equal(words2, words)
    np.testing.assert_array_equal(lnw2, lnw)
