"""Shape-bucket ladder for arbitrary-resolution serving.

Every distinct input shape compiles its own codec executables (the axon
remote compiler takes minutes per model-sized program and the persistent
cache does not work under the tunnel — CLAUDE.md), so a directory of N
mixed-resolution images naively pays O(N distinct shapes) compiles.  The
cure: pad inputs to a SMALL LADDER of canvas buckets, so the expensive
executables (analysis/synthesis transforms, slice-stats chain — all keyed
by the padded shape) compile O(#buckets) times.

This generalizes the reference's hard /64-divisibility requirement
(AutoEncoderRGB_Journal.py:312's F.pad usage assumes it) the same way the
container's transparent /64 padding does: the bucket is just MORE
transparent padding, recorded nowhere — the container header keeps the
original (h, w) and the decoder crops back.  Transparent padding is cheap
in bits for the masked codecs (and FREE with rate gating, which skips
entropy-coding fully-transparent latent cells), so the trade is a bounded
bpp overhead for a 10-100x cut in compile count.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

Shape = Tuple[int, int]


def pad64(h: int, w: int) -> Shape:
    """The minimal /64-aligned canvas for an (h, w) image."""
    return (-(-h // 64) * 64, -(-w // 64) * 64)


def choose_buckets(sizes: Iterable[Shape],
                   max_waste: float = 0.3) -> Dict[Shape, Shape]:
    """Map each (h, w) input size to a /64-aligned bucket canvas.

    Greedy from the largest padded shape down: a size folds into an
    existing bucket when the bucket covers it and the extra padded area
    (bucket_area / own_minimal_padded_area - 1) stays within
    ``max_waste``; otherwise its own minimal /64 canvas becomes a new
    bucket.  Deterministic in the multiset of sizes (ties broken by
    shape), so encode runs over the same directory always pick the same
    ladder.

    max_waste=0 degenerates to exact /64 padding (one bucket per distinct
    padded shape); larger values trade transparent-padding bits for fewer
    compiled executables.
    """
    max_waste = max(0.0, float(max_waste))
    mapping: Dict[Shape, Shape] = {}
    buckets: List[Shape] = []
    distinct = sorted({(int(h), int(w)) for h, w in sizes},
                      key=lambda s: (pad64(*s)[0] * pad64(*s)[1], s),
                      reverse=True)
    for h, w in distinct:
        ph, pw = pad64(h, w)
        own = ph * pw
        best = None
        for bh, bw in buckets:
            if bh >= ph and bw >= pw and bh * bw <= own * (1 + max_waste):
                if best is None or bh * bw < best[0] * best[1]:
                    best = (bh, bw)
        if best is None:
            best = (ph, pw)
            buckets.append(best)
        mapping[(h, w)] = best
    return mapping


def pad_batch(items: list, batch: int) -> tuple:
    """Pad `items` to a multiple of `batch` by repeating the last item,
    returning (chunks, real_counts): fixed-size chunks plus how many
    entries of each are real.  Keeps every chunk at the SAME batch size so
    a directory with a ragged tail reuses the full-batch executables
    instead of compiling a one-off remainder-sized program."""
    chunks, real = [], []
    for i in range(0, len(items), batch):
        ch = list(items[i:i + batch])
        real.append(len(ch))
        ch += [ch[-1]] * (batch - len(ch))
        chunks.append(ch)
    return chunks, real
