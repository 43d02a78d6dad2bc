"""Real bitstream encode/decode for both codecs (host/device split).

Mirrors AutoEncoder.compress/decompress (AutoEncoderRGB_Journal.py:312-415)
with the TPU-native division of labour designed in SURVEY §3.4:

  * device (jit): analysis transform, hyper encode/decode, per-slice
    (mu, sigma) convs, symbol quantization, index building — everything
    tensor-shaped, produced as int32 arrays in as few passes as possible
    (compress is ONE jitted pass; decompress needs one device pass per
    slice because the decoded symbols feed the next slice's convs).
  * host (C++ rANS): byte-stream encode/decode with 16-bit quantized CDFs.

Two serving-oriented upgrades over the reference's per-image serial loop
(AutoEncoderRGB_Journal.py:390-410, 10 host<->device ping-pongs per image):

  1. The decode slice loop is FUSED — finishing slice i-1 (sym+mu+lrp) and
     computing slice i's (mu, index) happen in one dispatched program, so a
     full decode is num_slices+1 dispatches instead of 2*num_slices.
  2. compress/decompress are BATCHED over images: the per-slice device
     round trip (the unavoidable serial step of channel-autoregression —
     the host must see slice i's indexes before it can rANS-decode slice
     i's bytes) is paid once per slice for the whole batch, and the B
     independent rANS streams are coded on host threads (the ctypes calls
     release the GIL).
  3. The decode TAIL is PARALLEL: with max_support_slices=5, slices 5..9
     all condition on exactly slices 0..4, so one stats pass + one index
     fetch covers the whole tail (6 round trips instead of 10 for the RGB
     codec; see decompress_chain(tail_parallel=...)).
  4. OPTIONALLY the host leaves the decode loop entirely: lane-format
     streams (compress_batch(stream_format="lanes32")) are decoded ON
     DEVICE by a lax.scan in the same jit program as the stats convs and
     the synthesis transform (decompress_device, entropy/device_rans.py)
     — z decode + the whole channel-AR chain + decode_image in ONE
     dispatch, ~2 host syncs per batch instead of 11.
"""

from __future__ import annotations

import functools
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import device_rans
from ..entropy.gaussian import GaussianConditional, get_scale_table
from ..native import rans
from ..ops.mask_pyramid import mask_pyramid
from ..utils.flatparams import FlatParams

_MAX_CODING_THREADS = 8

_GAUSS_INV_CACHE: dict = {}


def _gauss_inverse(gc) -> dict:
    """build_inverse of the Gaussian scale table, cached per process
    (the 64-row table is fixed by get_scale_table)."""
    key = gc.quantized_cdfs.shape
    hit = _GAUSS_INV_CACHE.get(key)
    if hit is None:
        hit = device_rans.build_inverse(gc.quantized_cdfs, gc.cdf_lengths)
        _GAUSS_INV_CACHE[key] = hit
    return hit


def drive_chains(chains: Sequence) -> List:
    """Round-robin a set of decode-chain generators to completion and
    return their results (StopIteration values), in order.

    Each chain yields right after enqueueing device work and fetches /
    host-decodes when resumed, so driving chains A and B together makes
    A's host rANS + transfers run while B's device dispatch computes and
    vice versa — the intra-request analog of PipelinedCodec's cross-batch
    overlap (PERFORMANCE.md round-2 "next targets").  Results are
    bit-identical to serial driving: interleaving only reorders *when*
    independent work is enqueued on the single device stream."""
    outs: List = [None] * len(chains)
    live = list(enumerate(chains))
    try:
        while live:
            still = []
            for i, ch in live:
                try:
                    next(ch)
                    still.append((i, ch))
                except StopIteration as e:
                    outs[i] = e.value
            live = still
    finally:
        # one chain raising (e.g. a corrupt rANS stream) must not leak
        # the sibling chains' native decoder state in a long-lived
        # serving process: generator .close() runs their finally blocks
        for _, ch in live:
            ch.close()
    return outs


class CodecIO:
    """Wraps a codec model (+params) with entropy tables and jitted passes.

    kind: "rgb" or "mask".
    """

    def __init__(self, model, params, kind: str = "rgb",
                 rate_gate: bool = False, sharding=None):
        self.model = model
        self.params = params
        self.kind = kind
        # multi-chip batch-parallel serving (SURVEY §2.3): a batch-leading
        # jax.sharding.NamedSharding here places every host->device upload
        # of the decode chain (decoded symbols, z_hat) across the data
        # mesh, so the slice programs run SPMD — images are independent,
        # XLA inserts no collectives, and the streams/recon are
        # bit-identical to single-device (tests/test_serving_sharded.py).
        # The batch must divide the mesh's data axis.  Encode needs no
        # flag: pass batch-sharded device arrays to compress_batch.
        self.sharding = sharding
        self.num_slices = 10 if kind == "rgb" else 5
        # channel-AR support truncation (ChannelARPrior.max_support_slices,
        # reference AutoEncoderRGB_Journal.py:245): slices >= max_support
        # all condition on exactly the first max_support decoded slices,
        # which makes the decode TAIL parallel (see _tail_stats_fn)
        self.max_support = 5
        # alpha-rate gating (rgb only): latent cells whose /8 pool of the
        # recon alpha is exactly 0 are never entropy-coded — the decoder
        # derives the same gate from the same decoded alpha and fills
        # symbol 0 (y_hat = mu + lrp).  See RGBCodec.rate_gate for the
        # forward-estimate analog.  Per-call override via compress_batch /
        # decompress_batch(rate_gate=...) (the container passes its header
        # flag so old blobs decode with either setting).
        self.rate_gate = bool(rate_gate) and kind == "rgb"
        # every jitted pass takes the params as ONE flat buffer: the axon
        # tunnel charges ~14 ms per runtime argument buffer per execution,
        # so the 772-leaf tree as an argument costs seconds/call while the
        # flat buffer runs at full speed (utils/flatparams.py; probe:
        # tools/argleaf_probe.py). Checkpoint swaps still reuse every
        # cached executable (set_params -> repack, structure unchanged).
        dest = None
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            dest = NamedSharding(sharding.mesh, PartitionSpec())
        self._fp = FlatParams(params, device=dest)
        self.gc = GaussianConditional(get_scale_table())
        self.gc.update()
        self.eb_tables = self._build_eb_tables()
        self._pool = ThreadPoolExecutor(max_workers=_MAX_CODING_THREADS)
        self._dz_fns: dict = {}
        self._tail_fns: dict = {}
        self._variant_lock = threading.Lock()
        # lane-format (device-decodable) stream machinery, built lazily:
        # merged gauss+z CDF tables as ONE int32 runtime buffer + the
        # static layout the decode program unpacks it with
        self._lane_state: Optional[dict] = None
        self._lane_fns: dict = {}

    def _put(self, x, batch_axis: int = 0):
        """Upload a host array, batch-sharded when self.sharding is set."""
        if self.sharding is None:
            return jnp.asarray(x)
        spec = self.sharding.spec
        if batch_axis:
            from jax.sharding import NamedSharding, PartitionSpec
            spec = PartitionSpec(*([None] * batch_axis), *spec)
            return jax.device_put(
                np.asarray(x), NamedSharding(self.sharding.mesh, spec))
        return jax.device_put(np.asarray(x), self.sharding)

    def set_params(self, params):
        """Swap model weights WITHOUT dropping compiled executables.

        Every jitted pass takes params as ONE flat runtime buffer (never
        a closure), so repacking reuses all cached executables — through
        the axon tunnel each remote compile costs minutes, which makes
        evaluating N checkpoints of the same model N× cheaper this way
        (the RD sweep evals 4 models back to back). Only the host-side
        rANS CDF tables are params-derived state and are rebuilt here."""
        self.params = params
        self._fp.repack(params)
        self.eb_tables = self._build_eb_tables()
        if self._lane_state is not None:
            old_layout = self._lane_state["layout"]
            self._lane_state = None
            if self._lane_tables()["layout"] != old_layout:
                # z CDF widths grew past the padded layout: the compiled
                # decode programs unpack a stale geometry — drop them
                # (rare across same-architecture checkpoints; pad_cols
                # growth absorbs small changes)
                self._lane_fns.clear()

    def _pjit(self, run):
        """jit `run(params_tree, ...)` as a flat-buffer executable.

        The unravel is read from self._fp at TRACE time, so set_params
        (same tree structure) never retraces; the flat buffer is the only
        param argument the executable sees."""
        def wrapped(flat, *args):
            return run(self._fp.unravel(flat), *args)
        return jax.jit(wrapped)

    # ------------------------------------------------------------ tables

    def _build_eb_tables(self):
        from ..entropy.bottleneck import EntropyBottleneck
        eb_mod = EntropyBottleneck(192)
        return eb_mod.cdf_tables(self.params["prior"]["entropy_bottleneck"])

    # ------------------------------------------- lane-format (device) path

    LANES_DEFAULT = 128

    def _lane_tables(self) -> dict:
        """Merged y-Gaussian + z-bottleneck CDF tables packed into ONE
        int32 runtime buffer (single argument — the tunnel charges per
        argument buffer) + the static unpack layout.  The z half is
        params-derived and rebuilt by set_params; its columns pad up to
        a /64 multiple so same-architecture checkpoint swaps keep the
        layout (and every compiled decode program) stable."""
        if self._lane_state is None:
            g = device_rans.pack_tables(
                self.gc.quantized_cdfs, self.gc.cdf_lengths, self.gc.offsets)
            t = self.eb_tables
            zc = int(np.asarray(t["quantized_cdfs"]).shape[1])
            z = device_rans.pack_tables(
                t["quantized_cdfs"], t["cdf_lengths"], t["offsets"],
                pad_cols=-(-zc // 64) * 64)
            merged = device_rans.merge_tables(g, z)
            # dense inverse lookup for the Gaussian rows (the y decode's
            # fast path); params-independent, so cached per scale table
            buf, layout = device_rans.pack_table_buffer(
                merged, inverse=_gauss_inverse(self.gc))
            self._lane_state = {
                "merged": merged, "layout": layout,
                "buf_dev": self._put(buf),
            }
        return self._lane_state

    def _lane_blob(self, sym_flat, idx_flat, seg_ends, lanes, shape,
                   alive=None, gate=None) -> dict:
        st = self._lane_tables()
        m = st["merged"]
        words, lnw = rans.encode_lanes(
            sym_flat, idx_flat, seg_ends, lanes, m["cdfs"],
            m["max_values"] + 2, m["offsets"], alive=alive)
        out = {"format": "lanes32", "lanes": lanes,
               "stream": device_rans.split_stream(words, lnw),
               "shape": shape}
        if gate is not None:
            out["gate"] = gate
        return out

    def _lane_compress_device(self, pre, args, gate_host, rg: bool,
                              dzd: bool, lanes: Optional[int]):
        """Device-encode path of compress_batch(stream_format="lanes32"):
        one dispatch produces the finished lane words; the host only
        serializes them.  Returns the blob list, or None when a lane
        overflowed its static word budget (caller falls back to the
        host coder — byte-identical output either way)."""
        lead = args[1] if (rg and self.kind == "rgb") else args[0]
        bsz, hp, wp = lead.shape[0], lead.shape[1], lead.shape[2]
        zh, zw = hp // 64, wp // 64
        lh, lw = hp // 8, wp // 8
        n_total = zh * zw * 192 + lh * lw * 80
        lanes = lanes or min(
            self.LANES_DEFAULT,
            max(8, 1 << int(np.log2(max(n_total // 512, 8)))))
        # word budget: 16 bits/word -> 8 coded bits per symbol per lane
        # on average before overflow; typical content codes ~0.4
        budget = max(64, (n_total // lanes) // 2 + 16)
        fn = self._lane_encode_variant(rg, dzd, lanes, budget)
        words_d, nwords_d, ovf_d, _ = fn(
            self._fp.flat, self._lane_tables()["buf_dev"], *pre, *args)
        nwords, ovf = jax.device_get((nwords_d, ovf_d))
        if bool(ovf):
            return None
        wmax = int(nwords.max())
        wbucket = min(int(words_d.shape[-1]), -(-wmax // 64) * 64)
        words = np.asarray(jax.device_get(words_d[:, :, :wbucket]))

        def one(b):
            flat = np.concatenate(
                [words[b, l, :nwords[b, l]] for l in range(lanes)])
            out = {"format": "lanes32", "lanes": lanes,
                   "stream": device_rans.split_stream(flat, nwords[b]),
                   "shape": (zh, zw)}
            if gate_host is not None:
                out["gate"] = gate_host[b]
            return out

        if bsz == 1:
            return [one(0)]
        return list(self._pool.map(one, range(bsz)))

    def _build_lane_encode_fn(self, gated: bool, deadzoned: bool,
                              lanes: int, budget: int):
        """ONE jit program for the ENTIRE lane-format encode: analysis
        transform, hyper path, per-slice (mu, sigma, symbols, indexes),
        then the reverse-scan rANS encode of every segment on-device
        (entropy/device_rans.py encode_segment).  Only the emitted
        words cross to the host (~stream-sized) — the v64 path fetches
        the full symbol+index tensors instead (~30 MB per Kodak batch
        16, the encode bottleneck under per-byte transfer costs)."""
        model = self.model
        kind = self.kind
        layout = self._lane_tables()["layout"]
        build_indexes = self.gc.build_indexes

        def run(params, tbuf, *args):
            def inner(m):
                rest = list(args)
                dz = rest.pop(0) if deadzoned else None
                gate = rest.pop(0) if gated else None
                if kind == "rgb":
                    x, mask, me2, me3 = rest
                    y = m.encoder(m.policy.cast_in(x), me2, me3)
                else:
                    (mask_in,) = rest
                    y = m.encoder(m.policy.cast_in(mask_in))
                y = y.astype(jnp.float32)
                bsz, h, w, mch = y.shape
                z = m.prior.h_a(y).astype(jnp.float32)
                medians = m.prior.entropy_bottleneck.medians()
                z_sym = jnp.round(z - medians[None, None, None, :])
                z_hat = z_sym + medians[None, None, None, :]
                lm, ls = m.prior.hyper_decode(z_hat)
                lm = lm.astype(jnp.float32)
                ls = ls.astype(jnp.float32)

                zh, zw, zc = z.shape[1], z.shape[2], z.shape[3]
                z_idx = device_rans.z_channel_indexes(zh, zw, zc) \
                    + layout["z_row_offset"]
                segments = [(z_sym.reshape(bsz, -1).astype(jnp.int32),
                             jnp.broadcast_to(jnp.asarray(z_idx)[None],
                                              (bsz, z_idx.size)), False)]

                sw = mch // m.prior.num_slices
                y_hat_slices: List = []
                for i in range(m.prior.num_slices):
                    y_slice = y[..., i * sw:(i + 1) * sw]
                    support = y_hat_slices[:m.prior.max_support_slices]
                    mu, scale = m.prior.slice_stats(lm, ls, support, i,
                                                    (h, w))
                    index = build_indexes(scale).astype(jnp.int32)
                    r = y_slice - mu
                    if deadzoned:
                        sym = jnp.sign(r) * jnp.maximum(
                            jnp.floor(jnp.abs(r) + 0.5 - dz), 0.0)
                    else:
                        sym = jnp.round(r)
                    if gated:
                        sym = sym * gate.astype(jnp.float32)
                    y_hat = sym + mu
                    y_hat = y_hat + m.prior.slice_lrp(lm, support, y_hat, i)
                    y_hat_slices.append(y_hat)
                    segments.append((sym.reshape(bsz, -1).astype(jnp.int32),
                                     index.reshape(bsz, -1), True))

                tables = device_rans.unpack_table_buffer(tbuf, layout)
                state, wptr, out = device_rans.init_encode(
                    (bsz,), lanes, budget)
                for sym_f, idx_f, gateable in reversed(segments):
                    n_i = sym_f.shape[-1]
                    idx_steps = device_rans.to_steps(idx_f, lanes)
                    sym_steps = device_rans.to_steps(sym_f, lanes)
                    if gateable and gated:
                        act = jnp.broadcast_to(
                            gate.astype(bool), (bsz, h, w, sw))
                        act_steps = device_rans.to_steps(
                            act.reshape(bsz, -1), lanes, fill=False)
                    else:
                        t_i = -(-n_i // lanes)
                        act_np = (np.arange(t_i * lanes) < n_i) \
                            .reshape(t_i, 1, lanes)
                        act_steps = jnp.broadcast_to(
                            jnp.asarray(act_np), (t_i, bsz, lanes))
                    state, wptr, out = device_rans.encode_segment(
                        tables, state, wptr, out, idx_steps, sym_steps,
                        act_steps)
                words, nwords, overflow = device_rans.finish_lanes(
                    state, wptr, out)
                return (words.astype(jnp.uint16), nwords, overflow,
                        jnp.asarray([zh, zw], jnp.int32))

            return model.apply({"params": params}, method=inner)

        return self._pjit(run)

    def _lane_encode_variant(self, gated: bool, deadzoned: bool,
                             lanes: int, budget: int):
        key = ("enc", gated, deadzoned, lanes, budget)
        with self._variant_lock:
            fn = self._lane_fns.get(key)
            if fn is None:
                fn = self._build_lane_encode_fn(gated, deadzoned, lanes,
                                                budget)
                self._lane_fns[key] = fn
        return fn

    def _lane_decode_fn(self, k: int, gated: bool, zh: int, zw: int):
        """One jitted program for the ENTIRE decode: z lane decode ->
        hyper decode -> per-slice (stats -> lane decode -> lrp) for the
        first k slices -> mean-fill tail -> synthesis transform.  No
        host round trips: the channel-AR loop runs on-chip against the
        uploaded bitstream (entropy/device_rans.py).  Reference analog:
        AutoEncoderRGB_Journal.py:373-415 ping-pongs every slice through
        host rANS."""
        key = (k, gated, zh, zw)
        with self._variant_lock:
            fn = self._lane_fns.get(key)
        if fn is not None:
            return fn
        model = self.model
        kind = self.kind
        S, n = self.max_support, self.num_slices
        layout = self._lane_tables()["layout"]
        build_indexes = self.gc.build_indexes
        C_Z = 192

        def run(params, tbuf, words_u16, lane_base, *rest):
            rest = list(rest)
            gate = rest.pop(0) if gated else None

            def inner(m):
                tables = device_rans.unpack_table_buffer(tbuf, layout)
                words = words_u16.astype(jnp.uint32)
                state, ptr = device_rans.init_lanes(words, lane_base)
                bsz, lanes = lane_base.shape

                # z segment: static per-position channel indexes
                z_n = zh * zw * C_Z
                z_idx = device_rans.z_channel_indexes(zh, zw, C_Z) \
                    + layout["z_row_offset"]
                t_z = -(-z_n // lanes)
                z_idx = np.pad(z_idx, (0, t_z * lanes - z_n)) \
                    .reshape(t_z, 1, lanes)
                z_act = (np.arange(t_z * lanes) < z_n) \
                    .reshape(t_z, 1, lanes)
                syms, state2, ptr2 = device_rans.decode_segment(
                    tables, words, state, ptr,
                    jnp.broadcast_to(jnp.asarray(z_idx),
                                     (t_z, bsz, lanes)),
                    jnp.broadcast_to(jnp.asarray(z_act),
                                     (t_z, bsz, lanes)))
                state, ptr = state2, ptr2
                z_sym = device_rans.from_steps(syms, z_n) \
                    .reshape(bsz, zh, zw, C_Z).astype(jnp.float32)
                medians = m.prior.entropy_bottleneck.medians()
                z_hat = z_sym + medians[None, None, None, :]

                lm, ls = m.prior.hyper_decode(z_hat)
                lm = lm.astype(jnp.float32)
                ls = ls.astype(jnp.float32)
                h, w = lm.shape[1], lm.shape[2]

                ys: List = []
                for i in range(k):
                    sup = ys[:S]
                    mu, scale = m.prior.slice_stats(lm, ls, sup, i, (h, w))
                    index = build_indexes(scale).astype(jnp.int32)
                    sw = index.shape[-1]
                    idx_steps = device_rans.to_steps(
                        index.reshape(bsz, -1), lanes)
                    if gate is not None:
                        act = jnp.broadcast_to(
                            gate.astype(bool), (bsz, h, w, sw))
                        act_steps = device_rans.to_steps(
                            act.reshape(bsz, -1), lanes, fill=False)
                    else:
                        n_i = h * w * sw
                        t_i = -(-n_i // lanes)
                        act_np = (np.arange(t_i * lanes) < n_i) \
                            .reshape(t_i, 1, lanes)
                        act_steps = jnp.broadcast_to(
                            jnp.asarray(act_np), (t_i, bsz, lanes))
                    syms, state, ptr = device_rans.decode_segment(
                        tables, words, state, ptr, idx_steps, act_steps,
                        inverse=tables["inverse"])
                    sym = device_rans.from_steps(syms, h * w * sw) \
                        .reshape(bsz, h, w, sw).astype(jnp.float32)
                    y = sym + mu
                    y = y + m.prior.slice_lrp(lm, sup, y, i)
                    ys.append(y)
                for i in range(k, n):
                    # progressive preview tail: symbol 0 everywhere
                    # (y = mu + lrp, the rate-gated-cell reconstruction)
                    sup = ys[:S]
                    mu, _ = m.prior.slice_stats(lm, ls, sup, i, (h, w))
                    y = mu + m.prior.slice_lrp(lm, sup, mu, i)
                    ys.append(y)
                y_hat = jnp.concatenate(ys, axis=-1)

                if kind == "rgb":
                    # the mask pyramid is built INSIDE this program from
                    # the reconstructed alpha: one argument buffer + one
                    # dispatch fewer than shipping md2/md3 separately
                    # (the tunnel charges ~14 ms per argument buffer)
                    (rm,) = rest
                    md = mask_pyramid(rm)
                    x = m.decoder(y_hat.astype(m.policy.compute_dtype),
                                  md[1], md[2])
                else:
                    x = m.decoder(y_hat.astype(m.policy.compute_dtype))
                return jnp.clip(x.astype(jnp.float32), 0.0, 1.0), y_hat

            return model.apply({"params": params}, method=inner)

        fn = self._pjit(run)
        with self._variant_lock:
            return self._lane_fns.setdefault(key, fn)

    def decompress_device(self, compressed: Sequence[dict],
                          mask=None, max_slices: Optional[int] = None,
                          _return_latent: bool = False):
        """Decode lane-format (``stream_format="lanes32"``) blobs wholly
        on-device: ONE dispatch runs z decode, the channel-AR slice loop
        (bitstream decoded by lax.scan), and the synthesis transform.
        Host<->device syncs per batch: the stream upload + the result
        fetch — vs 11 index round trips for the host-coder chain
        (PERFORMANCE.md round-4 batch-1 ladder).

        mask: the reconstructed alpha, device-resident (rgb kind
        only) — the mask pyramid is built inside the decode program.
        Returns the reconstruction as a DEVICE array (callers fetch or
        keep chaining); with _return_latent also the decoded y_hat."""
        if self.sharding is not None:
            raise NotImplementedError(
                "lane-format decode under batch-sharded serving is not "
                "wired yet — the packed word buffer is not batch-leading; "
                "use the v64 chain path on sharded meshes")
        k = self.num_slices if max_slices is None else max(
            0, min(int(max_slices), self.num_slices))
        zh, zw = compressed[0]["shape"]
        lanes = compressed[0]["lanes"]
        assert all(c["shape"] == (zh, zw) and c["lanes"] == lanes
                   and c.get("format") == "lanes32" for c in compressed), \
            "decompress_device requires same-shaped lanes32 streams"
        per_image = [device_rans.parse_stream(c["stream"], lanes)
                     for c in compressed]
        flat, lane_base = device_rans.pack_streams(per_image, lanes)
        gated = "gate" in compressed[0]
        args = [self._lane_tables()["buf_dev"], self._put(flat),
                self._put(lane_base)]
        if gated:
            gate = np.stack([c["gate"] for c in compressed])
            args.append(self._put(gate.astype(np.uint8)))
        if self.kind == "rgb":
            assert mask is not None, \
                "rgb decompress_device needs mask=recon_alpha"
            args.append(mask)
        x_hat, y_hat = self._lane_decode_fn(k, gated, zh, zw)(
            self._fp.flat, *args)
        return (x_hat, y_hat) if _return_latent else x_hat

    # ------------------------------------------------------- device fns

    def _build_compress_fn(self, gated: bool, deadzoned: bool = False):
        model = self.model
        kind = self.kind
        build_indexes = self.gc.build_indexes

        def run(params, *args):
            def inner(m):
                rest = args
                if deadzoned:
                    # dz rides as a TRACED scalar: sweeping the deadzone
                    # width never recompiles this executable
                    dz, *rest = rest
                if gated:
                    gate, *rest = rest
                    gate_f = gate.astype(jnp.float32)
                if kind == "rgb":
                    x, mask, me2, me3 = rest
                    y = m.encoder(m.policy.cast_in(x), me2, me3)
                else:
                    (mask_in,) = rest
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
                    r = y_slice - mu
                    if deadzoned:
                        # widened zero bin: |r| <= 0.5 + dz codes symbol 0
                        # (classic deadzone quantizer).  Encoder-only —
                        # the decoder reconstructs sym + mu either way,
                        # and y_hat below uses the SAME deadzoned symbols
                        # the stream carries, so AR support stays in sync.
                        sym = jnp.sign(r) * jnp.maximum(
                            jnp.floor(jnp.abs(r) + 0.5 - dz), 0.0)
                    else:
                        sym = jnp.round(r)
                    if gated:
                        # gated cells carry symbol 0 — same y_hat the
                        # decoder reconstructs without reading any bits
                        sym = sym * gate_f
                    y_hat = sym + mu
                    y_hat = y_hat + m.prior.slice_lrp(lm, support, y_hat, i)
                    y_hat_slices.append(y_hat)
                    sym_list.append(sym.astype(jnp.int16))
                    idx_list.append(index.astype(jnp.uint8))
                # int16/uint8 keeps the host fetch small (the tunnel pays
                # per byte): symbols are bounded by the 0-50-bit clamp and
                # scale-table indexes by the 64-entry table
                return (jnp.stack(sym_list), jnp.stack(idx_list),
                        z_sym.astype(jnp.int16), z.shape)

            return model.apply({"params": params}, method=inner)

        return self._pjit(run)

    @functools.cached_property
    def _compress_fn(self):
        return self._build_compress_fn(False)

    @functools.cached_property
    def _compress_fn_gated(self):
        return self._build_compress_fn(True)

    def _compress_variant(self, gated: bool, deadzoned: bool):
        if not deadzoned:
            return self._compress_fn_gated if gated else self._compress_fn
        # locked: PipelinedCodec submits batches from two threads, and an
        # unsynchronized check-then-build would trigger the multi-minute
        # remote compile twice for the same program
        with self._variant_lock:
            if gated not in self._dz_fns:
                self._dz_fns[gated] = self._build_compress_fn(gated, True)
            return self._dz_fns[gated]

    @functools.cached_property
    def _hyper_decode_fn(self):
        model = self.model

        def run(params, z_hat):
            def inner(m):
                lm, ls = m.prior.hyper_decode(z_hat)
                return lm.astype(jnp.float32), ls.astype(jnp.float32)
            return model.apply({"params": params}, method=inner)

        return self._pjit(run)

    @functools.cached_property
    def _first_stats_fn(self):
        """(params, lm, ls) -> (mu_0, index_0): slice 0 has no support."""
        model = self.model

        def run(params, lm, ls):
            def inner(m):
                h, w = lm.shape[1], lm.shape[2]
                mu, scale = m.prior.slice_stats(lm, ls, [], 0, (h, w))
                return mu, self.gc.build_indexes(scale).astype(jnp.uint8)
            return model.apply({"params": params}, method=inner)

        return self._pjit(run)

    @functools.cached_property
    def _step_fns(self):
        """step[i] (i>=1) fuses: finish slice i-1 from its decoded symbols
        (y_hat = sym + mu + lrp) AND produce slice i's (mu, index) — one
        device dispatch per decoded slice."""
        model = self.model
        fns: List = [None]
        for i in range(1, self.num_slices):
            def run(params, lm, ls, sym_prev, mu_prev, *support, i=i):
                def inner(m):
                    h, w = lm.shape[1], lm.shape[2]
                    sup = list(support)
                    y_prev = sym_prev.astype(jnp.float32) + mu_prev
                    y_prev = y_prev + m.prior.slice_lrp(
                        lm, sup[:m.prior.max_support_slices], y_prev, i - 1)
                    sup.append(y_prev)
                    mu, scale = m.prior.slice_stats(
                        lm, ls, sup[:m.prior.max_support_slices], i, (h, w))
                    return y_prev, mu, self.gc.build_indexes(scale).astype(
                        jnp.uint8)
                return model.apply({"params": params}, method=inner)
            fns.append(self._pjit(run))
        return fns

    @functools.cached_property
    def _tail_stats_fn(self):
        """Finish slice S-1 (S = max_support) AND produce (mu, index) for
        EVERY remaining slice in one dispatch.  The channel-AR support is
        truncated to the first S decoded slices (reference support slicing
        at AutoEncoderRGB_Journal.py:245), so slices S..n-1 do not feed
        each other's stats — the strictly sequential part of the decode is
        only slices 0..S-1.  For the RGB codec (n=10, S=5) this cuts the
        per-batch index round trips from 10 to 6; the mask codec (n=S=5)
        has no tail and keeps the serial chain."""
        model = self.model
        S, n = self.max_support, self.num_slices

        def run(params, lm, ls, sym_prev, mu_prev, *support):
            def inner(m):
                h, w = lm.shape[1], lm.shape[2]
                sup = list(support)
                y_prev = sym_prev.astype(jnp.float32) + mu_prev
                y_prev = y_prev + m.prior.slice_lrp(lm, sup[:S], y_prev,
                                                    S - 1)
                sup.append(y_prev)
                mus, idxs = [], []
                for i in range(S, n):
                    mu, scale = m.prior.slice_stats(lm, ls, sup[:S], i,
                                                    (h, w))
                    mus.append(mu)
                    idxs.append(
                        self.gc.build_indexes(scale).astype(jnp.uint8))
                return y_prev, jnp.stack(mus), jnp.stack(idxs)
            return model.apply({"params": params}, method=inner)

        return self._pjit(run)

    def _tail_assemble_fn(self, t: int):
        """Finish tail slices S..S+t-1 from their decoded symbols and
        mean-fill S+t..n-1 (progressive preview), one dispatch — the mu
        for every tail slice was already produced by _tail_stats_fn."""
        key = ("asm", t)
        with self._variant_lock:
            fn = self._tail_fns.get(key)
        if fn is not None:
            return fn
        model = self.model
        S, n = self.max_support, self.num_slices

        def run(params, lm, syms_tail, mu_tail, *support):
            def inner(m):
                sup = list(support)[:S]
                outs = []
                for j in range(n - S):
                    mu = mu_tail[j]
                    y = syms_tail[j].astype(jnp.float32) + mu if j < t \
                        else mu
                    y = y + m.prior.slice_lrp(lm, sup, y, S + j)
                    outs.append(y)
                return jnp.concatenate(outs, axis=-1)
            return model.apply({"params": params}, method=inner)

        fn = self._pjit(run)
        with self._variant_lock:
            return self._tail_fns.setdefault(key, fn)

    @functools.cached_property
    def _last_finish_fn(self):
        """Finish the final slice (no further stats needed)."""
        model = self.model
        i = self.num_slices - 1

        def run(params, lm, sym, mu, *support):
            def inner(m):
                y_hat = sym.astype(jnp.float32) + mu
                return y_hat + m.prior.slice_lrp(
                    lm, list(support)[:m.prior.max_support_slices], y_hat, i)
            return model.apply({"params": params}, method=inner)

        return self._pjit(run)

    def _tail_fill_fn(self, k: int):
        """Mean-fill completion for a progressive decode stopped after k
        decoded slices: finish slice k-1 from its decoded symbols, then run
        slices k..num_slices-1 with symbol 0 (y_hat = mu + lrp, exactly the
        reconstruction a rate-gated cell gets) — ONE fused device dispatch
        for the whole tail, no further host<->device round trips.

        The channel-AR chain is causal (slice i's stats depend only on
        slices < i, AutoEncoderRGB_Journal.py:237-264), so the first k
        slices of a progressive decode are bit-identical to a full decode;
        only the mean-filled tail differs."""
        with self._variant_lock:
            fn = self._tail_fns.get(k)
        if fn is not None:
            return fn
        model = self.model
        n = self.num_slices

        if k == 0:
            def run(params, lm, ls):
                def inner(m):
                    h, w = lm.shape[1], lm.shape[2]
                    ys: List = []
                    for i in range(n):
                        sup = ys[:m.prior.max_support_slices]
                        mu, _ = m.prior.slice_stats(lm, ls, sup, i, (h, w))
                        y = mu + m.prior.slice_lrp(lm, sup, mu, i)
                        ys.append(y)
                    return jnp.concatenate(ys, axis=-1)
                return model.apply({"params": params}, method=inner)
        else:
            def run(params, lm, ls, sym_prev, mu_prev, *support):
                def inner(m):
                    h, w = lm.shape[1], lm.shape[2]
                    ys = list(support)
                    y_prev = sym_prev.astype(jnp.float32) + mu_prev
                    y_prev = y_prev + m.prior.slice_lrp(
                        lm, ys[:m.prior.max_support_slices], y_prev, k - 1)
                    ys.append(y_prev)
                    tail = [y_prev]
                    for i in range(k, n):
                        sup = ys[:m.prior.max_support_slices]
                        mu, _ = m.prior.slice_stats(lm, ls, sup, i, (h, w))
                        y = mu + m.prior.slice_lrp(lm, sup, mu, i)
                        ys.append(y)
                        tail.append(y)
                    return jnp.concatenate(tail, axis=-1)
                return model.apply({"params": params}, method=inner)

        fn = self._pjit(run)
        with self._variant_lock:
            return self._tail_fns.setdefault(k, fn)

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

        return self._pjit(run)

    # ----------------------------------------------------------- public

    def compress_batch(self, image: Optional[np.ndarray] = None,
                       mask: Optional[np.ndarray] = None,
                       rate_gate: Optional[bool] = None,
                       deadzone: float = 0.0,
                       stream_format: str = "v64",
                       lanes: Optional[int] = None) -> List[dict]:
        """Batched compress: one device pass for all images, then B
        independent rANS streams coded on host threads. Returns one
        {"strings": [y, z], "shape": (zh, zw)} dict per image.

        rate_gate overrides the constructor default (rgb only): gated
        latent cells are excluded from the y stream entirely.
        deadzone > 0 widens the quantizer's zero bin by dz on each side
        (runtime rate control, no retraining, decoder-agnostic).

        stream_format="lanes32" emits the device-decodable lane format
        instead (one stream per image carrying z + all y slices as
        ``lanes`` interleaved 32-bit rANS lanes): decompress_device
        then decodes the whole AR chain on-chip in one dispatch.  Costs
        ~4 flush bytes per lane (~+1-2 %% rate at Kodak sizes);
        bit-exact symbols either way.  Lane-format encode defaults to
        the C++ host coder (measured faster under this environment's
        tunnel at batches 1-8: the device reverse-scan's per-push
        scatter overhead outweighs the ~30 MB symbol-fetch saving —
        PERFORMANCE.md round-5 ladder v2); RGBA_TPU_DEVICE_ENCODE=1
        switches to the on-device encoder (byte-identical streams,
        word-budget overflow falls back to host transparently)."""
        rg = self.rate_gate if rate_gate is None else (
            bool(rate_gate) and self.kind == "rgb")
        dzd = float(deadzone) > 0.0
        pre: list = [jnp.float32(deadzone)] if dzd else []
        gate_host = None
        if self.kind == "rgb":
            mask_dev = jnp.asarray(mask)
            me = mask_pyramid(mask_dev)
            args = (jnp.asarray(image), mask_dev, me[1], me[2])
            batch = image.shape[0]
            if rg:
                # the /8 pyramid level is already computed for me3; the
                # encoder's gate is the single source of truth — it ships
                # in the container (the decoder must NOT re-derive it:
                # a differently-compiled mask decoder could flip an
                # 8-bit-boundary alpha pixel and desync the stream)
                gate_host = np.asarray(jax.device_get(me[2])) > 0
                args = (jnp.asarray(gate_host),) + args
        else:
            args = (jnp.asarray(mask),)
            batch = mask.shape[0]

        if stream_format == "lanes32" and os.environ.get(
                "RGBA_TPU_DEVICE_ENCODE", "0") == "1":
            out = self._lane_compress_device(pre, args, gate_host, rg,
                                             dzd, lanes)
            if out is not None:
                return out
            # overflow fallback: re-run through the host coder below

        if self.kind == "rgb":
            syms_d, idxs_d, z_d, z_shape = \
                self._compress_variant(rg, dzd)(self._fp.flat, *pre, *args)
        else:
            syms_d, idxs_d, z_d, z_shape = \
                self._compress_variant(False, dzd)(self._fp.flat, *pre, *args)

        t = self.eb_tables
        shape = tuple(int(s) for s in jax.device_get(z_shape)[1:3])

        if stream_format == "lanes32":
            req_lanes = lanes
            z_off = self._lane_tables()["layout"]["z_row_offset"]

            def code_part_lanes(part, gate_part):
                y_syms, y_idxs, z_sym = part
                n_slices, bs, lh, lw, sw = y_syms.shape
                c = z_sym.shape[-1]
                z_n, s_n = z_sym[0].size, lh * lw * sw
                # auto lane count: ~6 bytes/lane of flush+header overhead
                # argue for >=512 symbols per lane; cap at LANES_DEFAULT
                # (the decode scan length is n_total / lanes)
                n_total = z_n + n_slices * s_n
                lanes = req_lanes or min(
                    self.LANES_DEFAULT,
                    max(8, 1 << int(np.log2(max(n_total // 512, 8)))))
                z_idx = device_rans.z_channel_indexes(
                    z_sym.shape[1], z_sym.shape[2], c) + z_off
                seg_ends = z_n + s_n * np.arange(n_slices + 1, dtype=np.int64)
                seg_ends[0] = z_n  # [z, z+s, z+2s, ...]

                def one(b):
                    sym = np.concatenate([z_sym[b].ravel(),
                                          y_syms[:, b].ravel()])
                    idx = np.concatenate([z_idx, y_idxs[:, b].ravel()])
                    alive = gate = None
                    if gate_part is not None:
                        gate = gate_part[b]
                        alive = np.concatenate([
                            np.ones(z_n, np.uint8),
                            np.broadcast_to(gate[None],
                                            (n_slices, lh, lw, sw))
                            .astype(np.uint8).ravel()])
                    return self._lane_blob(sym, idx, seg_ends, lanes,
                                           shape, alive=alive, gate=gate)

                if bs == 1:
                    return [one(0)]
                return list(self._pool.map(one, range(bs)))

            code_part = code_part_lanes
        else:

            def code_part(part, gate_part):
                """rANS-code one fetched sub-batch on host threads."""
                y_syms, y_idxs, z_sym = part
                n_slices, bs, lh, lw, sw = y_syms.shape
                c = z_sym.shape[-1]
                z_indexes = np.broadcast_to(
                    np.arange(c, dtype=np.int32), z_sym.shape[1:]).ravel()

                def one(b):
                    z_string = rans.encode_with_indexes(
                        z_sym[b].ravel(), z_indexes,
                        t["quantized_cdfs"], t["cdf_lengths"], t["offsets"])
                    # slice-major symbol order — the decoder reads slice 0
                    # first
                    syms_b = y_syms[:, b].ravel()
                    idxs_b = y_idxs[:, b].ravel()
                    if gate_part is not None:
                        alive = np.broadcast_to(
                            gate_part[b][None],
                            (n_slices, lh, lw, sw)).ravel()
                        syms_b, idxs_b = syms_b[alive], idxs_b[alive]
                    y_string = rans.encode_with_indexes(
                        syms_b, idxs_b, self.gc.quantized_cdfs,
                        self.gc.cdf_lengths, self.gc.offsets)
                    out = {"strings": [y_string, z_string], "shape": shape}
                    if gate_part is not None:
                        out["gate"] = gate_part[b]       # (lh, lw, 1) bool
                    return out

                if bs == 1:
                    return [one(0)]
                return list(self._pool.map(one, range(bs)))

        def fetch(sl):
            got = jax.device_get((syms_d[:, sl], idxs_d[:, sl], z_d[sl]))
            return tuple(a.astype(np.int32) for a in got)

        def gate_of(sl):
            return None if gate_host is None else gate_host[sl]

        # split-fetch overlap: half B's bytes cross the link in a worker
        # thread while half A's streams are rANS-coded on the host (the
        # encode analog of decompress_chain's host/device interleave) —
        # same executable, so the streams are bit-identical by construction
        half = batch // 2
        if half == 0:
            return code_part(fetch(slice(0, batch)), gate_of(slice(0, batch)))
        fut = self._pool.submit(fetch, slice(half, batch))
        out = code_part(fetch(slice(0, half)), gate_of(slice(0, half)))
        return out + code_part(fut.result(), gate_of(slice(half, batch)))

    def decompress_chain(self, compressed: Sequence[dict],
                         gate_host: Optional[np.ndarray] = None,
                         max_slices: Optional[int] = None,
                         tail_parallel: bool = True):
        """Generator form of the decode slice loop: decodes the latent
        y_hat for a batch of same-shaped streams, yielding right after
        each device dispatch so a driver (``drive_chains``) can interleave
        several chains — one chain's host rANS + index fetch overlaps
        another chain's device compute.  The container uses this to run
        the mask codec's 5-slice chain under the RGB codec's 10-slice
        chain with the SAME executables (results bit-identical to serial
        order — interleaving only changes *when* independent programs are
        enqueued on the single device stream).

        gate_host: (B, lh, lw, 1) bool alive bitmap for rate-gated
        streams — the encoder's exact gate (container section 5).
        Returns the device-resident y_hat via the generator return value
        (``StopIteration.value``).

        tail_parallel=True (default) decodes slices >= max_support in one
        round trip: their stats condition only on the first max_support
        decoded slices (_tail_stats_fn), so the host fetches ONE stacked
        index array and rANS-decodes the whole tail back-to-back.  Streams
        and symbols are untouched — only the number of host<->device round
        trips changes (10 -> 6 for the RGB codec).  tail_parallel=False
        keeps the per-slice serial chain (tests pin bit-identical y_hat
        between the two)."""
        k = self.num_slices if max_slices is None else max(
            0, min(int(max_slices), self.num_slices))
        batch = len(compressed)
        zh, zw = compressed[0]["shape"]
        assert all(c["shape"] == (zh, zw) for c in compressed), \
            "decompress requires same-shaped streams"
        t = self.eb_tables
        c = t["quantized_cdfs"].shape[0]
        z_indexes = np.broadcast_to(np.arange(c, dtype=np.int32),
                                    (1, zh, zw, c))

        def decode_z(b):
            return rans.decode_with_indexes(
                compressed[b]["strings"][1], z_indexes, t["quantized_cdfs"],
                t["cdf_lengths"], t["offsets"]).astype(np.float32)

        z_sym = np.concatenate(list(self._pool.map(decode_z, range(batch))))
        z_hat = self._put(z_sym + t["medians"][None, None, None, :])

        lm, ls = self._hyper_decode_fn(self._fp.flat, z_hat)
        decoders = [rans.RansDecoder(c["strings"][0]) for c in compressed]

        def decode_slice(args):
            dec, idx, alive = args
            if alive is None:
                return dec.decode_stream(idx, self.gc.quantized_cdfs,
                                         self.gc.cdf_lengths, self.gc.offsets)
            flat = idx.ravel()
            decoded = dec.decode_stream(flat[alive], self.gc.quantized_cdfs,
                                        self.gc.cdf_lengths, self.gc.offsets)
            out = np.zeros(flat.size, np.int32)   # gated cells: symbol 0
            out[alive] = decoded
            return out.reshape(idx.shape)

        alives: List = [None] * batch
        y_hats: List = []
        # try/finally: native decoder state must not leak when the chain
        # is abandoned mid-drive (a sibling chain raising makes
        # drive_chains .close() this generator -> GeneratorExit) or when
        # a corrupt stream raises below; RansDecoder.close is idempotent
        try:
            if k == 0:
                y_hat = self._tail_fill_fn(0)(self._fp.flat, lm, ls)
                yield
                return y_hat
            # tail split: slices 0..serial-1 decode through the strictly
            # sequential chain; the remaining `tail` slices (if any) decode
            # from one batched stats pass (support truncation, _tail_stats_fn)
            tail = k - self.max_support if (tail_parallel and
                                            k > self.max_support) else 0
            serial = k - tail
            mu_tail = idx_tail = None
            mu, index = self._first_stats_fn(self._fp.flat, lm, ls)
            yield  # hyper decode + slice-0 stats enqueued; let siblings run
            for i in range(serial):
                # uint8 down, int16 up — the tunnel pays per byte
                idx_np = jax.device_get(index).astype(np.int32)
                if gate_host is not None and alives[0] is None:
                    sw = idx_np.shape[-1]
                    lh, lw = idx_np.shape[1], idx_np.shape[2]
                    alives = [np.broadcast_to(gate_host[b], (1, lh, lw, sw))
                              .ravel() for b in range(batch)]
                syms = list(self._pool.map(
                    decode_slice,
                    [(decoders[b], idx_np[b:b + 1], alives[b])
                     for b in range(batch)]))
                sym_dev = self._put(np.concatenate(syms).astype(np.int16))
                if i + 1 < serial:
                    y_prev, mu, index = self._step_fns[i + 1](
                        self._fp.flat, lm, ls, sym_dev, mu, *y_hats)
                    y_hats.append(y_prev)
                elif tail:
                    y_prev, mu_tail, idx_tail = self._tail_stats_fn(
                        self._fp.flat, lm, ls, sym_dev, mu, *y_hats)
                    y_hats.append(y_prev)
                elif k < self.num_slices:
                    y_hats.append(self._tail_fill_fn(k)(
                        self._fp.flat, lm, ls, sym_dev, mu, *y_hats))
                else:
                    y_hats.append(self._last_finish_fn(
                        self._fp.flat, lm, sym_dev, mu, *y_hats))
                yield  # slice i finished + next stats enqueued
            if tail:
                # ONE fetch for every tail slice's indexes, then each image's
                # stream decodes its whole tail back-to-back on a host thread
                idxs_np = jax.device_get(idx_tail).astype(np.int32)

                def decode_tail(b):
                    return np.stack([
                        decode_slice((decoders[b], idxs_np[j, b:b + 1],
                                      alives[b])) for j in range(tail)])

                syms = list(self._pool.map(decode_tail, range(batch)))
                sym_dev = self._put(
                    np.concatenate(syms, axis=1).astype(np.int16),
                    batch_axis=1)
                y_hats.append(self._tail_assemble_fn(tail)(
                    self._fp.flat, lm, sym_dev, mu_tail, *y_hats))
                yield  # tail finished in one dispatch
            return jnp.concatenate(y_hats, axis=-1)
        finally:
            for dec in decoders:
                dec.close()

    def decompress_chains(self, compressed: Sequence[dict],
                          gate_host: Optional[np.ndarray] = None,
                          max_slices: Optional[int] = None,
                          interleave: Optional[int] = None,
                          tail_parallel: bool = True) -> List:
        """Split `compressed` into up to `interleave` contiguous sub-batch
        groups and return one decompress_chain per group (callers
        concatenate the chain results in order to recover the batch).
        The container uses this to put the RGB codec's chains and the mask
        codec's chain under one ``drive_chains`` loop.

        interleave=None (default) auto-picks from the round-4 warm ladder
        (PERFORMANCE.md): 2 sub-chains for even batches 4-8 (+45% measured
        at batch 8 vs the prior tail-parallel interleave=1 default; +74%
        vs plain serial), 1 elsewhere.  The auto rule is restricted to
        even batches >=4 so both sub-chains keep equal size >=2 — odd
        batches would compile two distinct slice executables per process
        (multi-minute remote compiles each) and batches 2-3 would pay a
        doubled per-sync tunnel fee on size-1 sub-chains that was never
        measured (ADVICE r4)."""
        batch = len(compressed)
        if self.sharding is not None:
            # batch-sharded serving: every sub-chain's uploads land
            # across the mesh, so sub-batches must divide the data
            # axis — and whole-batch SPMD is the point of the mesh.
            # (Latent round-4 bug: auto G=2 split batch 8 into 4s on an
            # 8-device mesh -> device_put divisibility error.)
            interleave = 1
        elif interleave is None:
            interleave = 2 if batch in (4, 6, 8) else 1
        groups = [slice(0, batch)]
        if interleave > 1 and batch >= 2:
            bb = np.linspace(0, batch, min(int(interleave), batch) + 1)
            bb = bb.astype(int)
            groups = [slice(int(a), int(b))
                      for a, b in zip(bb[:-1], bb[1:]) if b > a]
        return [self.decompress_chain(
                    list(compressed[g]),
                    gate_host=None if gate_host is None else gate_host[g],
                    max_slices=max_slices, tail_parallel=tail_parallel)
                for g in groups]

    def decode_image(self, y_hat, mask=None, device: bool = False,
                     md=None):
        """Finish a decode from the latent a decompress_chain returned:
        synthesis transform (+ mask-pyramid gating for the RGB codec),
        clipped to [0, 1].  device=True keeps the result on-chip.
        md: optionally a precomputed mask_pyramid(mask) (the rate-gated
        fallback in decompress_batch already built one for the gate)."""
        if self.kind == "rgb":
            if md is None:
                md = mask_pyramid(jnp.asarray(mask))
            x_hat = self._decode_image_fn(self._fp.flat, y_hat, md[1], md[2])
        else:
            x_hat = self._decode_image_fn(self._fp.flat, y_hat)
        return x_hat if device else np.asarray(jax.device_get(x_hat))

    def decompress_batch_with_latent(self, compressed: Sequence[dict],
                                     **kw) -> tuple:
        """decompress_batch variant that also returns the decoded latent
        y_hat (same device/host placement as the reconstruction) — the
        typed spelling of the old ``return_latent=True`` flag, used by
        tests to pin the progressive-decode causality guarantee."""
        return self.decompress_batch(compressed, _return_latent=True, **kw)

    def decompress_batch(self, compressed: Sequence[dict],
                         mask: Optional[np.ndarray] = None,
                         device: bool = False,
                         rate_gate: Optional[bool] = None,
                         max_slices: Optional[int] = None,
                         _return_latent: bool = False,
                         interleave: Optional[int] = None,
                         tail_parallel: bool = True,
                         ) -> "np.ndarray | jax.Array":
        """Batched decompress of same-shaped streams. The slice loop runs
        once for the whole batch: one fused device dispatch + one index
        fetch per slice, with the B rANS streams decoded on host threads.

        interleave=G > 1 splits the batch into G sub-batch chains driven
        in lockstep, so sub-batch g's host rANS + transfers overlap
        sub-batch g+1's device stats — intra-batch latency hiding on top
        of PipelinedCodec's cross-batch overlap.  Each sub-batch size
        compiles its own slice executables (one-time per serving
        process); results are identical, streams untouched.  The default
        (None) auto-picks G=2 for even batches 4-8, G=1 elsewhere — the
        measured round-4 ladder optimum (PERFORMANCE.md), narrowed to
        equal sub-batches >=2 per ADVICE r4.

        device=True returns the reconstruction as a device array (no host
        fetch) so callers can keep post-processing on-chip — the container
        uses this to chain mask-decode -> constraint -> RGB gating without
        host round trips.

        max_slices=k (progressive preview, 0 <= k <= num_slices) decodes
        only the first k latent slices from the stream and completes the
        rest with the prior's means (symbol 0) in one fused dispatch — a
        preview costs k+2 device dispatches instead of num_slices+1 and
        skips the tail's rANS work entirely.  The channel-AR chain is
        causal, so the k decoded slices are bit-identical to a full
        decode; quality degrades gracefully as k shrinks (the slice
        ordering makes early slices the most informative — the same
        structure the reference's max_support_slices=5 exploits).  The
        stream itself is untouched: ONE encoded blob serves every preview
        level.  decompress_batch_with_latent additionally returns y_hat (used by
        tests to pin the causality guarantee).

        For rate-gated streams the gate the ENCODER used must be supplied:
        either per-stream (compressed[b]["gate"], how the container ships
        it) or it is re-derived from `mask` — the fallback is only safe
        when this process also produced the streams (re-deriving from an
        alpha decoded by a differently-compiled executable could flip an
        8-bit-boundary pixel and desync the rANS stream)."""
        rg = self.rate_gate if rate_gate is None else (
            bool(rate_gate) and self.kind == "rgb")
        compressed = list(compressed)
        gate_host = None
        md = None
        if rg:
            if all("gate" in c for c in compressed):
                gate_host = np.stack([np.asarray(c["gate"]) for c in
                                      compressed])
            else:
                # keep the pyramid: decode_image needs md[1]/md[2] too —
                # one model-sized dispatch instead of two on this path
                md = mask_pyramid(jnp.asarray(mask))
                gate_host = np.asarray(jax.device_get(md[2])) > 0

        parts = drive_chains(self.decompress_chains(
            compressed, gate_host=gate_host, max_slices=max_slices,
            interleave=interleave, tail_parallel=tail_parallel))
        y_hat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        x_hat = self.decode_image(y_hat, mask=mask, device=True, md=md)
        if not device:
            x_hat = np.asarray(jax.device_get(x_hat))
            if _return_latent:
                return x_hat, np.asarray(jax.device_get(y_hat))
        elif _return_latent:
            return x_hat, y_hat
        return x_hat

    def compress(self, image: Optional[np.ndarray] = None,
                 mask: Optional[np.ndarray] = None) -> dict:
        """RGB: compress(image, mask) — mask is the (recon) alpha used for
        gating, per compress() in the reference which uses the GT mask and
        its pyramid (:314-315). Mask codec: compress(mask=alpha)."""
        lead = image if self.kind == "rgb" else mask
        assert lead.shape[0] == 1, "compress expects batch 1 (per-image)"
        return self.compress_batch(image=image, mask=mask)[0]

    def decompress(self, compressed: dict,
                   mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Reconstruct the image (RGB) or alpha (mask) from byte strings."""
        return self.decompress_batch([compressed], mask=mask)
