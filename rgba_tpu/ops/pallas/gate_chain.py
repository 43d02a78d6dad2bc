"""Pallas TPU kernel: fused gated conv-chain (the attention-wrapper trunks).

Covers both gate wrappers of the reference with one kernel:

  * Win_noShift_Attention (Masked_Attention.py:143-189):
      out = x + RU^3(x) * sigmoid(conv1x1(RU^3(b_attn)))
    where RU = GELU(x + 1x1 -> GELU -> 3x3 -> GELU -> 1x1) chains
    (ResidualUnit, :150-169) — measured ~86 ms of a 381 ms batch-16 eval
    pass under XLA (PERFORMANCE.md), despite healthy matmul shapes,
    because every conv round-trips HBM and the elementwise GELU/gate glue
    doesn't fuse into the convs.
  * SimplifiedAttention (AutoEncoderMask_Journal.py:112-136):
      out = x + sigmoid(conv1x1(RB^3(x))) * RB^3(x)
    with plain bottleneck ResBlocks (ReLU, no post-activation), ~40 ms.

The kernel runs BOTH three-block bottleneck chains + the final 1x1 + the
sigmoid gate + residual in one VMEM-resident pass per spatial tile: HBM is
touched once for each input and once for the output.  3x3 convs build
im2col patches in a VMEM scratch (stores normalize the per-tap sublane
offsets — Mosaic cannot reshape/concat shifted slices directly) giving
K = 9*(C/2) contractions on the MXU.

Halo: each chain has three 3x3 convs => halo 3.  XLA pre-extracts
overlapping halo tiles (grid (B, nth, ntw), one tile per program, Pallas
double-buffers).  Border positions outside the image are re-zeroed before
every 3x3 conv to reproduce XLA's zero-padding of intermediate inputs.

Inference path (no custom VJP) — training uses the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3


def _act(v, kind: str):
    if kind == "relu":
        return jax.nn.relu(v)
    if kind == "gelu_tanh":
        return jax.nn.gelu(v, approximate=True)
    return jax.nn.gelu(v, approximate=False)      # exact erf


def _kernel(*refs, th: int, tw_: int, c: int, half: int, act: str,
            post_act: bool, img_h: int, img_w: int, shared_input: bool):
    if shared_input:
        x_ref, g_ref = refs[0], refs[0]
        weights = refs[1:-2]
    else:
        x_ref, g_ref = refs[0], refs[1]
        weights = refs[2:-2]
    (tw0, tb0, tw1, tb1, tw2, tb2,
     gw0, gb0, gw1, gb1, gw2, gb2, fw, fb) = weights
    o_ref, patches_ref = refs[-2], refs[-1]

    dt = x_ref.dtype
    r_base = pl.program_id(1) * th
    c_base = pl.program_id(2) * tw_

    def inside(vals, r):
        """Zero positions outside the image at halo level r."""
        nr, nc = vals.shape[0], vals.shape[1]
        r0 = r_base + (HALO - r)
        c0 = c_base + (HALO - r)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nr, nc, 1), 0) + r0
        cols = jax.lax.broadcasted_iota(jnp.int32, (nr, nc, 1), 1) + c0
        ok = ((rows >= HALO) & (rows < HALO + img_h) &
              (cols >= HALO) & (cols < HALO + img_w))
        return jnp.where(ok, vals, jnp.zeros_like(vals))

    def conv1x1(t, w, b, cout):
        nr, nc = t.shape[0], t.shape[1]
        y = jnp.dot(t.reshape(nr * nc, t.shape[2]), w,
                    preferred_element_type=jnp.float32)
        return (y + b).reshape(nr, nc, cout)

    spad = _slot_pad(half)

    def conv3x3(t, w, b):
        """t: (oh+2, ow+2, half) -> (oh, ow, half).

        Only the 3 dx column shifts are materialized (sublane rotations);
        dy shifts are free outer-dim slices contracted as 3 dy-grouped
        matmuls.  Tap slots are padded to 128 lanes so every store is
        lane-aligned — the zero-padded weight rows cost no extra MXU
        K-tiles (ceil(3*96/128) == ceil(3*128/128) == 3)."""
        oh, ow = t.shape[0] - 2, t.shape[1] - 2
        for dx in range(3):
            patches_ref[0:oh + 2, 0:ow, spad * dx:spad * dx + half] = \
                t[:, dx:dx + ow, :]
        acc = None
        for dy in range(3):
            p = patches_ref[dy:dy + oh, 0:ow, :]
            y = jnp.dot(p.reshape(oh * ow, 3 * spad), w[dy],
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return (acc + b).reshape(oh, ow, half)

    def chain(t_in, w0, b0, w1, b1, w2, b2):
        cur = t_in                                 # halo 3 at entry
        for blk in range(3):
            r = HALO - blk                         # input halo level
            h0 = _act(conv1x1(cur, w0[blk], b0[blk], half), act).astype(dt)
            h0 = inside(h0, r)                     # zero-pad emulation
            h1 = _act(conv3x3(h0, w1[blk], b1[blk]), act).astype(dt)
            h2 = conv1x1(h1, w2[blk], b2[blk], c)
            skip = cur[1:1 + h2.shape[0], 1:1 + h2.shape[1], :]
            out = h2 + skip.astype(jnp.float32)
            if post_act:
                out = _act(out, act)
            cur = out.astype(dt)
        return cur                                 # (th, tw, C)

    # zero the scratch once: the spad-half pad lanes of each tap slot are
    # never written by the dx stores, and their weight rows are zero —
    # but 0 * uninitialized could still poison (NaN bit patterns)
    patches_ref[...] = jnp.zeros(patches_ref.shape, patches_ref.dtype)

    x_t = x_ref[0, 0, 0]
    g_t = x_t if shared_input else g_ref[0, 0, 0]

    trunk = chain(x_t, tw0, tb0, tw1, tb1, tw2, tb2)
    gate = chain(g_t, gw0, gb0, gw1, gb1, gw2, gb2)
    fin = conv1x1(gate, fw[:], fb[:], c)
    out = x_t[HALO:HALO + th, HALO:HALO + tw_, :].astype(jnp.float32) + \
        trunk.astype(jnp.float32) * jax.nn.sigmoid(fin)
    o_ref[0, 0, 0] = out.astype(o_ref.dtype)


def _extract_tiles(x, th, tw):
    """(B, H, W, C) -> overlapping halo tiles (B, nth, ntw, ph, pw, C)."""
    b, h, w, c = x.shape
    nth, ntw = h // th, w // tw
    ph, pw = th + 2 * HALO, tw + 2 * HALO
    xp = jnp.pad(x, ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0)))
    rows = [xp[:, i * th:i * th + ph] for i in range(nth)]
    return jnp.stack(
        [jnp.stack([r[:, :, j * tw:j * tw + pw] for j in range(ntw)], axis=1)
         for r in rows], axis=1)


def _slot_pad(half):
    """Tap-slot lane width: pad to the 128-lane granule (assert model
    channel halves stay <= 128 — true for C in {80, 192})."""
    assert half <= 128, half
    return 128


def _stack_chain(params, names, key0, key1, key2, dt):
    """Stack the 3 blocks' conv params into (3, ...) arrays.

    The 3x3 kernels (HWIO) become (3 blocks, 3 dy, 3*spad, half) with rows
    ordered (dx, ci) and zero-padded ci (half -> spad=128) to match the
    lane-aligned patch slots."""
    w0 = jnp.stack([params[n][key0]["kernel"].reshape(
        params[n][key0]["kernel"].shape[-2], -1) for n in names]).astype(dt)
    b0 = jnp.stack([params[n][key0]["bias"] for n in names]).astype(jnp.float32)

    def dy_grouped(wk):   # (3, 3, half, half) -> (3, 3*spad, half)
        half_ = wk.shape[-1]
        spad = _slot_pad(half_)
        padded = jnp.pad(wk, ((0, 0), (0, 0), (0, spad - half_), (0, 0)))
        return padded.reshape(3, 3 * spad, half_)

    w1 = jnp.stack([dy_grouped(params[n][key1]["kernel"])
                    for n in names]).astype(dt)
    b1 = jnp.stack([params[n][key1]["bias"] for n in names]).astype(jnp.float32)
    w2 = jnp.stack([params[n][key2]["kernel"].reshape(
        params[n][key2]["kernel"].shape[-2], -1) for n in names]).astype(dt)
    b2 = jnp.stack([params[n][key2]["bias"] for n in names]).astype(jnp.float32)
    return w0, b0, w1, b1, w2, b2


def _pick_tile(n, cands):
    for t in cands:
        if n % t == 0:
            return t
    return 0


def gate_chain_tiles(h, w, c):
    """The (th, tw) the kernel would use, or (0, 0) if unsupported.

    VMEM budget: the kernel's scoped footprint scales ~linearly with tile
    area x channels (measured 24.8 MB at (32, 64) x C=192 — over the 16 MB
    v5e VMEM), so wide-channel layers take half-height tiles."""
    th_cands = (16, 8) if c > 96 else (32, 16, 8)
    return _pick_tile(h, th_cands), _pick_tile(w, (64, 32, 16, 8))


@functools.partial(jax.jit, static_argnames=(
    "act", "post_act", "trunk_names", "gate_names", "block_keys",
    "final_name", "interpret"))
def fused_gate_chain(x, g, params, *, act: str, post_act: bool,
                     trunk_names: tuple, gate_names: tuple,
                     block_keys: tuple, final_name: str,
                     interpret: bool = False):
    """x: skip/trunk input (B, H, W, C); g: gate-chain input (same shape)
    or None to reuse x.  params: dict of per-block conv params
    {name: {key: {kernel (k,k,I,O), bias (O,)}}} plus the final 1x1 under
    final_name.  Returns x + chain_t(x) * sigmoid(1x1(chain_g(g)))."""
    bsz, h, w, c = x.shape
    half = params[trunk_names[0]][block_keys[1]]["kernel"].shape[-1]
    th, tw = gate_chain_tiles(h, w, c)
    assert th and tw, (h, w)
    nth, ntw = h // th, w // tw
    ph, pw = th + 2 * HALO, tw + 2 * HALO
    dt = x.dtype

    shared = g is None
    tiles = [_extract_tiles(x, th, tw)]
    if not shared:
        tiles.append(_extract_tiles(g.astype(dt), th, tw))

    targs = _stack_chain(params, trunk_names, *block_keys, dt)
    gargs = _stack_chain(params, gate_names, *block_keys, dt)
    fw = params[final_name]["kernel"].reshape(c, c).astype(dt)
    fb = params[final_name]["bias"].astype(jnp.float32)

    kern = functools.partial(
        _kernel, th=th, tw_=tw, c=c, half=half, act=act, post_act=post_act,
        img_h=h, img_w=w, shared_input=shared)
    tile_spec = pl.BlockSpec((1, 1, 1, ph, pw, c),
                             lambda b, i, j: (b, i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14
    out = pl.pallas_call(
        kern,
        grid=(bsz, nth, ntw),
        in_specs=[tile_spec] * len(tiles) + w_specs,
        out_specs=pl.BlockSpec((1, 1, 1, th, tw, c),
                               lambda b, i, j: (b, i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nth, ntw, th, tw, c), dt),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALO, tw + 2 * HALO - 2,
                        3 * _slot_pad(half)), dt),
        ],
        interpret=interpret,
    )(*tiles, *targs, *gargs, fw, fb)
    # (B, nth, ntw, th, tw, C) -> (B, H, W, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, h, w, c)
