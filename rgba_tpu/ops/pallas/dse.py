"""Pallas TPU kernel: fused DSE enhancement tail.

The DSE (reference layers/TransformRGB.py:30-49 / mask variant
AutoEncoderMask_Journal.py:30-48) is a chain of 32-channel 3x3 convs at
full image resolution.  XLA achieves ~7% MXU on it (measured 48 ms per
batch-16 image set on v5e) because 32 channels strand 3/4 of the 128-lane
axis.  This kernel fuses the whole chain — six 3x3 convs + residuals +
the 1x1 in/out convs in one HBM read/write pass per tile — with the convs
as im2col matmuls assembled in VMEM.

v4 design — everything rides 128 lanes (measured history below):
  * PACK `pack` images into the lane axis: XLA pre-packs the batch into
    (B/pack, H, W, pack*cio) so in-kernel activations are
    (rows, cols, pack*32 = 128).  Channel mixing uses block-diagonal
    weights (kron(I_pack, w)) — images never mix, and the matmul's K/N
    tiles are dense.
  * im2col tap slots are pack*32 = 128 lanes wide, so every patch store
    lands at a 128-aligned lane offset — pure sublane copies, NO lane
    relayout.  v2/v3 stored taps at 32-lane offsets: ablation showed those
    relayouts were 114 of 167 ms (fused_nopatches 53 ms vs fused 167 ms).
  * VPU elementwise (acts, residuals, masks, casts) runs on full 128-lane
    vectors instead of 32-lane (4x-padded) ones.
  * border masking reproduces XLA's zero-padding of every conv's
    intermediate input (bias-valued frame positions otherwise leak in);
    measured cost: free (144.0 ms unmasked vs 144.9 on v2).

History: v1 whole-image VMEM blocks (OOM at Kodak size); v2
channels-leading per-tile grid (145 ms — lane-offset patch stores);
v3 channels-last tiles (167 ms — same stores, plus padded-lane I/O).

Trainable through ops/pallas/remat_vjp.py (backward = XLA chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 6         # 6 chained 3x3 convs
FILTERS = 32


def _conv3x3(t, w_ref, b_ref, out_h, out_w, patches_ref, cpk: int,
             no_patches: bool = False):
    """t: (out_h+2, out_w+2, cpk) -> (out_h, out_w, cpk) fp32 + bias.

    cpk = pack*32 lanes.  Only the 3 dx column shifts are materialized
    (sublane rotations — the expensive part); the dy shifts are free
    outer-dim slices, contracted as 3 dy-grouped K=3*cpk matmuls
    (same total MXU K-tiles as one 9-tap im2col matmul)."""
    if not no_patches:   # perf ablation: stale scratch, measures store cost
        for dx in range(3):
            patches_ref[0:out_h + 2, 0:out_w, cpk * dx:cpk * (dx + 1)] = \
                t[:, dx:dx + out_w, :]
    acc = None
    for dy in range(3):
        p = patches_ref[dy:dy + out_h, 0:out_w, :]
        # dot_general on the 3-D slice: contraction over the lane dim with
        # (out_h, out_w) as M — no explicit reshape, Mosaic addresses the
        # contiguous rows in place
        y = jax.lax.dot_general(p, w_ref[dy], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc + b_ref[:]


def _kernel(x_ref, w_in, b_in, w11, b11, w12, b12, w21, b21, w22, b22,
            w31, b31, w32, b32, w_out, b_out, o_ref, patches_ref, *,
            th: int, tw: int, cio: int, pack: int, leaky: bool,
            img_h: int, img_w: int,
            no_mask: bool = False, no_patches: bool = False):
    dt = x_ref.dtype
    cpk = pack * FILTERS
    ph, pw = th + 2 * HALO, tw + 2 * HALO
    r_base = pl.program_id(1) * th
    c_base = pl.program_id(2) * tw

    def act(v):
        return jax.nn.leaky_relu(v, 0.01) if leaky else jax.nn.relu(v)

    x_t = x_ref[0, 0, 0]                           # (ph, pw, pack*cio)

    def inside(vals, r):
        """Zero activations outside the image (see module docstring)."""
        if no_mask:   # perf experiment: border-wrong, measures mask cost
            return vals
        nr, nc = vals.shape[0], vals.shape[1]
        r0 = r_base + (HALO - r)
        c0 = c_base + (HALO - r)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nr, nc, 1), 0) + r0
        cols = jax.lax.broadcasted_iota(jnp.int32, (nr, nc, 1), 1) + c0
        ok = ((rows >= HALO) & (rows < HALO + img_h) &
              (cols >= HALO) & (cols < HALO + img_w))
        return jnp.where(ok, vals, jnp.zeros_like(vals))

    # input 1x1 conv: (ph*pw, pack*cio) x (pack*cio, pack*32) block-diag
    h0 = jnp.dot(x_t.reshape(ph * pw, pack * cio), w_in[:],
                 preferred_element_type=jnp.float32)
    h0 = (h0 + b_in[:]).reshape(ph, pw, cpk)
    first = inside(h0, HALO).astype(dt)

    def enh(tt, wa, ba, wb, bb, r):
        oh, ow = th + 2 * r, tw + 2 * r
        c1 = act(inside(_conv3x3(tt, wa, ba, oh + 2, ow + 2, patches_ref,
                                 cpk, no_patches), r + 1)).astype(dt)
        c2 = _conv3x3(c1, wb, bb, oh, ow, patches_ref, cpk, no_patches)
        out = c2 + tt[2:2 + oh, 2:2 + ow, :].astype(jnp.float32)
        return inside(out, r).astype(dt)

    t1 = enh(first, w11, b11, w12, b12, 4)
    t2 = enh(t1, w21, b21, w22, b22, 2)
    t3 = enh(t2, w31, b31, w32, b32, 0)            # (th, tw, cpk)
    merged = t3.astype(jnp.float32) + \
        first[HALO:HALO + th, HALO:HALO + tw, :].astype(jnp.float32)
    out = jnp.dot(merged.reshape(th * tw, cpk).astype(dt), w_out[:],
                  preferred_element_type=jnp.float32) + b_out[:]
    out = out.reshape(th, tw, pack * cio) + \
        x_t[HALO:HALO + th, HALO:HALO + tw, :].astype(jnp.float32)
    o_ref[0, 0, 0] = out.astype(o_ref.dtype)


def _block_diag(w, pack):
    """(ci, co) -> (pack*ci, pack*co) = kron(I_pack, w): packed images
    never mix."""
    return jnp.kron(jnp.eye(pack, dtype=w.dtype), w)


@functools.partial(jax.jit, static_argnames=("leaky", "tile", "pack",
                                             "interpret", "no_mask",
                                             "no_patches"))
def fused_dse(x, params, *, leaky: bool = False, tile=(32, 32),
              pack: int = 4, interpret: bool = False, no_mask: bool = False,
              no_patches: bool = False):
    """x: (B, H, W, Cio); params: dict with input_conv/enh{1,2,3}/output_conv
    weight matrices (see wrapper in ops/enhance.py). Returns (B, H, W, Cio).
    H, W must be divisible by the tile; pack is reduced to a divisor of B."""
    bsz, h, w, cio = x.shape
    th, tw = tile
    assert h % th == 0 and w % tw == 0, (h, w, tile)
    while bsz % pack:
        pack //= 2
    g = bsz // pack
    nth, ntw = h // th, w // tw
    cpk = pack * FILTERS
    dt = x.dtype

    xp = jnp.pad(x, ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0)))
    hp, wp = h + 2 * HALO, w + 2 * HALO
    # pack images onto the lane axis: (g, hp, wp, pack*cio)
    xp = xp.reshape(g, pack, hp, wp, cio).transpose(0, 2, 3, 1, 4)
    xp = xp.reshape(g, hp, wp, pack * cio)
    # overlapping halo tiles: (g, nth, ntw, ph, pw, pack*cio)
    ph, pw = th + 2 * HALO, tw + 2 * HALO
    rows = [xp[:, i * th:i * th + ph] for i in range(nth)]
    tiles = jnp.stack(
        [jnp.stack([r[:, :, j * tw:j * tw + pw] for j in range(ntw)], axis=1)
         for r in rows], axis=1)

    def rw(wk):   # (3,3,32,32) HWIO -> (3, 3*cpk, cpk): dy-grouped,
        # rows (dx, img, ci)-ordered to match the patch lanes
        return jnp.stack([
            jnp.concatenate([_block_diag(wk[dy, dx], pack)
                             for dx in range(3)], axis=0)
            for dy in range(3)]).astype(dt)

    def rb(bias):  # (32,) -> (cpk,) tiled per image
        return jnp.tile(bias, pack).astype(jnp.float32)

    args = [
        _block_diag(params["input_conv"]["kernel"].reshape(cio, FILTERS),
                    pack).astype(dt),
        rb(params["input_conv"]["bias"]),
    ]
    for k in ("enh1", "enh2", "enh3"):
        for c in ("conv1", "conv2"):
            args.append(rw(params[k][c]["kernel"]))
            args.append(rb(params[k][c]["bias"]))
    args.append(_block_diag(params["output_conv"]["kernel"].reshape(
        FILTERS, cio), pack).astype(dt))
    args.append(jnp.tile(params["output_conv"]["bias"],
                         pack).astype(jnp.float32))

    kern = functools.partial(_kernel, th=th, tw=tw, cio=cio, pack=pack,
                             leaky=leaky, img_h=h, img_w=w, no_mask=no_mask,
                             no_patches=no_patches)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args)
    out = pl.pallas_call(
        kern,
        grid=(g, nth, ntw),
        in_specs=[pl.BlockSpec((1, 1, 1, ph, pw, pack * cio),
                               lambda b, i, j: (b, i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((1, 1, 1, th, tw, pack * cio),
                               lambda b, i, j: (b, i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, nth, ntw, th, tw, pack * cio),
                                       dt),
        scratch_shapes=[
            pltpu.VMEM((ph, pw - 2, 3 * cpk), dt),
        ],
        interpret=interpret,
    )(tiles, *args)
    # (g, nth, ntw, th, tw, pack*cio) -> (B, H, W, cio)
    out = out.reshape(g, nth, ntw, th, tw, pack, cio)
    out = out.transpose(0, 5, 1, 3, 2, 4, 6)       # (g, pack, nth, th, ...)
    return out.reshape(bsz, h, w, cio)
