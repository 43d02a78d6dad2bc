"""On-device rANS decode: the TPU-native answer to the AR decode loop.

The channel-autoregressive decode's irreducible cost in the host-coder
design is one host<->device round trip per serial slice (the host must
see slice i's indexes before it can rANS-decode slice i's bytes) — 11
syncs per RGBA decode, ~38 ms each under the axon tunnel
(PERFORMANCE.md round-4 batch-1 ladder).  This module removes the host
from the loop entirely: the bitstream itself is uploaded once and
DECODED ON THE TPU inside the same jit program that runs the stats
convs, so the entire mask + RGB decode is a handful of dispatches with
no index round trips at all.

Format (produced by ``native/rans.rans32_encode_lanes``): each image
stream is L independent 32-bit rANS lanes (state in [2^16, 2^32),
16-bit renorm words, the same 16-bit quantized CDFs + 4-bit bypass
escape as the 64-bit host coder).  Symbols are assigned to lanes per
SEGMENT (z latent first, then each y slice in decode order): within a
segment, flat position p maps to lane (p % L), step (p // L).  A
``lax.scan`` step decodes one symbol in every lane of every image —
(B, L) symbols per step, pure VPU integer work — and the scan carry
(state, ptr) flows across segments so one lane set serves the whole
stream.

Rate-gated cells and tail positions (n % L != 0) are MASKED steps: the
encoder emits no ops for them and the decoder advances nothing
(``active``).  Bypass escapes are decoded with a bounded masked loop:
raw values are int32 so at most 8 four-bit chunks and exactly one count
chunk exist (the count chain in the host coder only continues at
n_bypass >= 15, unreachable for 32-bit raw values).

Reference analog: compressai's RansDecoder.decode_stream consumed on
the host per slice (AutoEncoderRGB_Journal.py:390-410); here decoding
is a device primitive so channel autoregression stays on-chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from jax import lax

PRECISION = 16
_MASK16 = (1 << 16) - 1
_L32 = 1 << 16
_BYPASS_BITS = 4
_MAX_BYPASS_CHUNKS = 8  # 32-bit raw values need at most 8 4-bit chunks
# scan-body unroll: the decode/encode scans run thousands of tiny VPU
# steps; unrolling amortizes the per-iteration loop overhead without
# changing results (the carry chain is untouched)
SCAN_UNROLL = 4


def pack_tables(cdfs, cdf_lengths, offsets, pad_cols: int = 0) -> dict:
    """Device-friendly CDF tables: rows padded with 2^16 so the
    symbol search ``sum(cdf[1:] <= cum)`` never walks past a row's
    valid length (cum < 2^16 always).  Returns plain numpy; callers
    upload/pack as they see fit."""
    cdfs = np.asarray(cdfs, dtype=np.int32)
    lens = np.asarray(cdf_lengths, dtype=np.int32)
    offs = np.asarray(offsets, dtype=np.int32)
    cols = max(int(cdfs.shape[1]), int(pad_cols))
    padded = np.full((cdfs.shape[0], cols), 1 << PRECISION, dtype=np.int32)
    for r in range(cdfs.shape[0]):
        n = int(lens[r])
        padded[r, :n] = cdfs[r, :n]
        # entries past the row's length stay 2^16 (= cdf[len-1]), so the
        # count-based search saturates at len-2 exactly
    return {"cdfs": padded, "max_values": lens - 2, "offsets": offs}


def _renorm(words, state, ptr, need):
    """Masked 16-bit renorm: lanes with ``need`` read words[ptr]."""
    w = words[jnp.clip(ptr, 0, words.shape[0] - 1)].astype(jnp.uint32)
    state = jnp.where(need, (state << 16) | w, state)
    return state, ptr + need.astype(jnp.int32)


def _get_bits(words, state, ptr, act, nbits):
    """Masked bypass bit read (mirrors the host dec_get_bits)."""
    val = jnp.where(act, (state & ((1 << nbits) - 1)).astype(jnp.int32), 0)
    state = jnp.where(act, state >> nbits, state)
    state, ptr = _renorm(words, state, ptr, act & (state < _L32))
    return val, state, ptr


def build_inverse(cdfs, cdf_lengths) -> dict:
    """Dense inverse lookup for the symbol search: for every (row, cum)
    pair precompute the decoded value and its (start, freq).  One
    (..., L) gather per scan step replaces the (..., L, C) row gather +
    C compares — the row-search path moved ~0.5 MB/step at Kodak batch
    8 and made the decode scan gather-bound (round-5 ladder).

    Tables (numpy, upload once — the Gaussian scale table is static
    across checkpoints):
      si:  (rows * 2^16,) int32 = start | (freq - 1) << 16
      val: (rows * 2^15,) int32 = two 16-bit values per word
           (cum even -> low half, odd -> high half)"""
    cdfs = np.asarray(cdfs, dtype=np.int64)
    lens = np.asarray(cdf_lengths, dtype=np.int32)
    rows = cdfs.shape[0]
    cum = np.arange(1 << PRECISION, dtype=np.int64)
    si = np.empty((rows, 1 << PRECISION), np.int32)
    val = np.empty((rows, 1 << PRECISION), np.int32)
    for r in range(rows):
        row = cdfs[r, :lens[r]]
        v = np.searchsorted(row, cum, side="right") - 1
        v = np.clip(v, 0, lens[r] - 2)
        start = row[v]
        freq = row[v + 1] - start
        si[r] = (start | ((freq - 1) << 16)).astype(np.int32)
        val[r] = v.astype(np.int32)
    packed = (val[:, 0::2] | (val[:, 1::2] << 16)).astype(np.int32)
    return {"si": si.reshape(-1), "val": packed.reshape(-1)}


def decode_segment(tables: dict, words, state, ptr, indexes, active,
                   inverse: Optional[dict] = None):
    """Decode one segment: ``indexes``/``active`` are (T, ..., L) with
    the scan over T; ``state``/``ptr`` are (..., L) carries from the
    previous segment (or ``init_lanes``).  Returns (symbols, state, ptr)
    with symbols shaped like ``indexes`` (masked steps decode 0).

    With ``inverse`` (build_inverse of the SAME rows the indexes refer
    to), the symbol search is two (..., L) table gathers instead of a
    row gather + C compares; results are bit-identical (pinned in
    tests) — use it for the Gaussian y segments, keep the row search
    for the short params-dependent z segment.

    All arithmetic is uint32 with int32 table values — bit-exact with
    the C++ twin ``rans32_decode_lanes`` (pinned in tests)."""
    cdfs = tables["cdfs"]
    max_values = tables["max_values"]
    offsets = tables["offsets"]

    def step(carry, inp):
        state, ptr = carry
        idx, act = inp
        cum = (state & _MASK16).astype(jnp.int32)
        if inverse is not None:
            si = inverse["si"][idx * (1 << PRECISION) + cum]
            start = si & _MASK16
            freq = (((si >> 16) & _MASK16) + 1).astype(jnp.uint32)
            w = inverse["val"][idx * (1 << (PRECISION - 1)) + (cum >> 1)]
            value = (w >> ((cum & 1) * 16)) & _MASK16
        else:
            cdf = cdfs[idx]                   # (..., L, C)
            value = jnp.sum((cdf[..., 1:] <= cum[..., None]),
                            axis=-1).astype(jnp.int32)
            start = jnp.take_along_axis(cdf, value[..., None],
                                        axis=-1)[..., 0]
            nxt = jnp.take_along_axis(cdf, value[..., None] + 1,
                                      axis=-1)[..., 0]
            freq = (nxt - start).astype(jnp.uint32)
        new_state = (freq * (state >> PRECISION)
                     + cum.astype(jnp.uint32) - start.astype(jnp.uint32))
        state = jnp.where(act, new_state, state)
        state, ptr = _renorm(words, state, ptr, act & (state < _L32))

        # bypass escape: value == max_value means the stream carries the
        # raw magnitude in 4-bit chunks (host coder append_symbol_ops).
        # Escapes are rare, so the whole read sequence is skipped via
        # lax.cond when no lane needs it (identity otherwise: the reads
        # are masked per lane and advance nothing for non-escape lanes).
        maxv = max_values[idx]
        is_max = act & (value == maxv)

        def bypass(args):
            state, ptr = args
            n_byp, state, ptr = _get_bits(words, state, ptr, is_max,
                                          _BYPASS_BITS)
            raw = jnp.zeros_like(value)
            for j in range(_MAX_BYPASS_CHUNKS):
                actj = is_max & (j < n_byp)
                bv, state, ptr = _get_bits(words, state, ptr, actj,
                                           _BYPASS_BITS)
                raw = raw | jnp.where(actj, bv << (_BYPASS_BITS * j), 0)
            v = raw >> 1
            esc = jnp.where((raw & 1) == 1, -v - 1, v + maxv)
            return state, ptr, jnp.where(is_max, esc, value)

        state, ptr, value = lax.cond(
            jnp.any(is_max), bypass, lambda a: (a[0], a[1], value),
            (state, ptr))
        sym = jnp.where(act, value + offsets[idx], 0)
        return (state, ptr), sym

    (state, ptr), syms = lax.scan(step, (state, ptr), (indexes, active),
                                  unroll=SCAN_UNROLL)
    return syms, state, ptr


def init_lanes(words, lane_base):
    """Initial (state, ptr) from each lane's first two words.
    ``lane_base`` is the absolute word offset of each lane's stream in
    the flat ``words`` array (shape (..., L))."""
    hi = words[lane_base].astype(jnp.uint32)
    lo = words[lane_base + 1].astype(jnp.uint32)
    return (hi << 16) | lo, lane_base + 2


def to_steps(flat, lanes: int, fill=0):
    """Reshape a (..., n) flat per-segment array into scan form
    (T, ..., L) with the lane-contract layout (p -> step p//L, lane
    p%L), padding the tail with ``fill``."""
    n = flat.shape[-1]
    t = -(-n // lanes)
    pad = [(0, 0)] * (flat.ndim - 1) + [(0, t * lanes - n)]
    arr = jnp.pad(flat, pad, constant_values=fill)
    arr = arr.reshape(flat.shape[:-1] + (t, lanes))
    return jnp.moveaxis(arr, -2, 0)


def from_steps(stepped, n: int):
    """Inverse of ``to_steps``: (T, ..., L) -> (..., n)."""
    arr = jnp.moveaxis(stepped, 0, -2)
    return arr.reshape(arr.shape[:-2] + (-1,))[..., :n]


# ----------------------------------------------------------- encode side

def _emit(out_words, wptr, need, word):
    """Masked 16-bit emit: lanes with ``need`` append ``word`` at their
    write pointer.  out_words is (..., L, W); wptr (..., L)."""
    w = out_words.shape[-1]
    slot = jnp.minimum(wptr, w - 1)
    cur = jnp.take_along_axis(out_words, slot[..., None],
                              axis=-1)[..., 0]
    val = jnp.where(need, word.astype(out_words.dtype), cur)
    out_words = jnp.put_along_axis(out_words, slot[..., None],
                                   val[..., None], axis=-1,
                                   inplace=False)
    return out_words, wptr + need.astype(jnp.int32)


def _udiv16(state, f):
    """Exact ``state // f`` when the quotient fits 16 bits (guaranteed
    post-renorm: state < f << 16): a 16-step bit search of
    multiply-compares — uint32-overflow-free (q <= 0xFFFF, f <= 0x10000
    so q*f < 2^32) and exact on every backend, unlike native integer
    division whose TPU lowering is slow."""
    q = jnp.zeros_like(state)
    for bit in reversed(range(16)):
        cand = q | jnp.uint32(1 << bit)
        q = jnp.where(cand * f <= state, cand, q)
    return q


def _put_sym(state, out_words, wptr, act, start, freq):
    """Masked rANS symbol push (mirrors the host enc32_put)."""
    f = freq.astype(jnp.uint32)
    need = act & (state >= (f << 16))
    out_words, wptr = _emit(out_words, wptr, need,
                            state & jnp.uint32(0xFFFF))
    state = jnp.where(need, state >> 16, state)
    q = _udiv16(state, f)
    new = (q << PRECISION) + (state - q * f) + start.astype(jnp.uint32)
    return jnp.where(act, new, state), out_words, wptr


def _put_bits(state, out_words, wptr, act, val, nbits):
    """Masked bypass bits push (mirrors the host enc32_put_bits)."""
    need = act & (state >= jnp.uint32(1 << (32 - nbits)))
    out_words, wptr = _emit(out_words, wptr, need,
                            state & jnp.uint32(0xFFFF))
    state = jnp.where(need, state >> 16, state)
    new = (state << nbits) | val.astype(jnp.uint32)
    return jnp.where(act, new, state), out_words, wptr


def encode_segment(tables: dict, state, wptr, out_words, indexes, symbols,
                   active):
    """Reverse-scan encode of one segment: processes steps T-1..0 (rANS
    encodes in reverse of decode order) pushing, per symbol, its bypass
    chunks (high chunk first), the chunk count, then the CDF-coded
    value — the exact reverse of ``decode_segment``'s read order, so the
    emitted words (reversed per lane + the flushed final state) decode
    bit-identically.  indexes/symbols/active are (T, ..., L) in DECODE
    step order; out_words (..., L, W) accumulates emissions in reverse
    order (callers reverse per-lane via ``finish_lanes``)."""
    cdfs = tables["cdfs"]
    cdfs_flat = tables["cdfs"].reshape(-1)
    max_values = tables["max_values"]
    offsets = tables["offsets"]

    def step(carry, inp):
        state, wptr, out_words = carry
        idx, sym, act = inp
        maxv = max_values[idx]
        value = sym - offsets[idx]
        neg = value < 0
        over = value >= maxv
        raw = jnp.where(neg, -2 * value - 1,
                        jnp.where(over, 2 * (value - maxv), 0))
        is_max = act & (neg | over)
        value = jnp.where(is_max, maxv, value)

        # chunk count: raw is int32 so n_byp <= 8 < 15 (single count
        # chunk; the host coder's count chaining is unreachable).  The
        # bypass pushes stay unconditional: per-lane masked, they touch
        # only (.., L) elements of the carry — a lax.cond here would
        # route the full word buffer through a branch and risk a
        # per-step copy, for pushes that were never the bottleneck
        # (the row gather below was — now a flat 2-entry gather).
        n_byp = jnp.zeros_like(raw)
        for j in range(1, _MAX_BYPASS_CHUNKS + 1):
            n_byp = jnp.where(
                (raw >> ((j - 1) * _BYPASS_BITS)) != 0, j, n_byp)
        # push bypass chunks high-to-low, then the count, then the
        # CDF-coded value (reverse of the decode read order)
        for j in reversed(range(_MAX_BYPASS_CHUNKS)):
            actj = is_max & (j < n_byp)
            chunk = (raw >> (j * _BYPASS_BITS)) & ((1 << _BYPASS_BITS) - 1)
            state, out_words, wptr = _put_bits(
                state, out_words, wptr, actj, chunk, _BYPASS_BITS)
        state, out_words, wptr = _put_bits(
            state, out_words, wptr, is_max, n_byp, _BYPASS_BITS)
        # direct flat gathers: the (row, value) pair addresses the two
        # needed CDF entries — no (..., L, C) row gather (the row path
        # made the encode scan gather-bound, round-5 ladder)
        base = idx * cdfs.shape[-1] + value
        start = cdfs_flat[base]
        nxt = cdfs_flat[base + 1]
        state, out_words, wptr = _put_sym(
            state, out_words, wptr, act, start, nxt - start)
        return (state, wptr, out_words), None

    (state, wptr, out_words), _ = lax.scan(
        step, (state, wptr, out_words), (indexes, symbols, active),
        reverse=True, unroll=SCAN_UNROLL)
    return state, wptr, out_words


def init_encode(batch_shape, lanes: int, max_words: int):
    """Fresh encode carries: state = L0, empty word buffers."""
    state = jnp.full(batch_shape + (lanes,), _L32, jnp.uint32)
    wptr = jnp.zeros(batch_shape + (lanes,), jnp.int32)
    out_words = jnp.zeros(batch_shape + (lanes, max_words), jnp.int32)
    return state, wptr, out_words


def finish_lanes(state, wptr, out_words):
    """Flush + reorder into decode order: each lane's stream becomes
    [state_hi, state_lo, emitted words reversed].  Returns
    (words (..., L, W+2) int32, nwords (..., L) int32, overflow bool) —
    overflow means some lane exceeded the static word budget and the
    caller must re-encode on the host (the streams are unusable)."""
    w = out_words.shape[-1]
    overflow = jnp.any(wptr >= w)
    # reversed gather: decode position i reads emitted word wptr-1-i
    pos = jnp.arange(w)
    src = wptr[..., None] - 1 - pos
    rev = jnp.take_along_axis(out_words, jnp.clip(src, 0, w - 1), axis=-1)
    rev = jnp.where(src >= 0, rev, 0)
    head = jnp.stack([(state >> 16).astype(jnp.int32),
                      (state & jnp.uint32(0xFFFF)).astype(jnp.int32)],
                     axis=-1)
    words = jnp.concatenate([head, rev], axis=-1)
    return words, wptr + 2, overflow


# --------------------------------------------------------------- packing

def pack_streams(per_image: Sequence[tuple], lanes: int,
                 bucket_words: int = 4096) -> tuple:
    """Host-side: pack per-image (words, lane_nwords) pairs from
    ``rans.encode_lanes`` into ONE flat uint16 word buffer + an int32
    (B, L) lane_base offset table, padding the buffer to a
    ``bucket_words`` multiple so re-encodes at similar rates reuse the
    same compiled decode program (shape buckets, not per-call shapes).

    The axon tunnel charges ~14 ms per runtime argument buffer per
    execution (PERFORMANCE.md round-4) — one packed buffer + one offset
    table keeps the whole bitstream at two argument buffers regardless
    of batch size or lane count."""
    batch = len(per_image)
    lane_base = np.zeros((batch, lanes), dtype=np.int32)
    parts = []
    off = 0
    for b, (words, lane_nwords) in enumerate(per_image):
        assert lane_nwords.size == lanes
        starts = np.concatenate(
            ([0], np.cumsum(lane_nwords[:-1]))).astype(np.int32)
        lane_base[b] = off + starts
        parts.append(np.asarray(words, dtype=np.uint16))
        off += int(np.sum(lane_nwords))
    total = -(-max(off, 1) // bucket_words) * bucket_words
    flat = np.zeros(total, dtype=np.uint16)
    if off:
        flat[:off] = np.concatenate(parts)
    return flat, lane_base


def split_stream(words: np.ndarray, lane_nwords: np.ndarray) -> bytes:
    """Serialize one image's lane stream for the container: uint16
    lane_nwords table then the words, little-endian."""
    lane_nwords = np.asarray(lane_nwords)
    assert int(lane_nwords.max(initial=0)) < (1 << 16)
    head = lane_nwords.astype("<u2").tobytes()
    return head + np.asarray(words, dtype="<u2").tobytes()


def parse_stream(data: bytes, lanes: int) -> tuple:
    """Inverse of ``split_stream`` -> (words uint16, lane_nwords i32)."""
    head = np.frombuffer(data[:2 * lanes], dtype="<u2").astype(np.int32)
    words = np.frombuffer(data[2 * lanes:], dtype="<u2")
    return words, head


def z_channel_indexes(zh: int, zw: int, channels: int) -> np.ndarray:
    """The z latent's CDF row per position: channel id, in the same
    (zh, zw, c) C-order flattening the host coder uses."""
    return np.broadcast_to(np.arange(channels, dtype=np.int32),
                           (zh, zw, channels)).reshape(-1)


def merge_tables(gauss: dict, z: dict) -> dict:
    """Two table sets (y Gaussian rows + z bottleneck rows) merged into
    one row space so a single packed buffer serves the whole decode:
    z rows live at offset ``gauss_rows``."""
    cols = max(gauss["cdfs"].shape[1], z["cdfs"].shape[1])

    def widen(t):
        c = t["cdfs"]
        if c.shape[1] < cols:
            pad = np.full((c.shape[0], cols - c.shape[1]), 1 << PRECISION,
                          dtype=np.int32)
            c = np.concatenate([c, pad], axis=1)
        return c

    return {
        "cdfs": np.concatenate([widen(gauss), widen(z)], axis=0),
        "max_values": np.concatenate(
            [gauss["max_values"], z["max_values"]]),
        "offsets": np.concatenate([gauss["offsets"], z["offsets"]]),
        "z_row_offset": int(gauss["cdfs"].shape[0]),
    }


def pack_table_buffer(tables: dict, inverse: Optional[dict] = None) -> tuple:
    """Flatten merged tables into ONE int32 buffer (single runtime
    argument) + the static layout needed to unpack inside jit.
    ``inverse`` (build_inverse of the Gaussian rows) rides in the same
    buffer so the fast-path decode costs no extra argument."""
    rows, cols = tables["cdfs"].shape
    parts = [tables["cdfs"].reshape(-1), tables["max_values"],
             tables["offsets"]]
    layout = {"rows": rows, "cols": cols,
              "z_row_offset": tables["z_row_offset"],
              "si_size": 0, "val_size": 0}
    if inverse is not None:
        parts += [inverse["si"], inverse["val"]]
        layout["si_size"] = int(inverse["si"].size)
        layout["val_size"] = int(inverse["val"].size)
    buf = np.concatenate(parts).astype(np.int32)
    return buf, layout


def unpack_table_buffer(buf, layout: dict) -> dict:
    """jit-side inverse of ``pack_table_buffer`` (layout is static)."""
    rows, cols = layout["rows"], layout["cols"]
    n = rows * cols
    out = {
        "cdfs": buf[:n].reshape(rows, cols),
        "max_values": buf[n:n + rows],
        "offsets": buf[n + rows:n + 2 * rows],
        "z_row_offset": layout["z_row_offset"],
        "inverse": None,
    }
    if layout.get("si_size"):
        o = n + 2 * rows
        out["inverse"] = {
            "si": buf[o:o + layout["si_size"]],
            "val": buf[o + layout["si_size"]:
                       o + layout["si_size"] + layout["val_size"]],
        }
    return out
