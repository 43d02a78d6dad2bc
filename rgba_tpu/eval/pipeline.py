"""Cross-batch pipelined codec serving.

The real-bitstream codec path (eval/container.py:RGBAFileCodec) alternates
between device compute (transforms, per-slice AR stats) and host work
(C++ rANS coding, byte fetches through the interconnect).  Within one
batch that alternation is a hard data dependency of channel
autoregression (the host must see slice i's indexes before it can decode
slice i's bytes — SURVEY §3.4), but *across* batches the resources are
independent: batch n's host rANS + transfers can overlap batch n+1's
device dispatches.

This module pipelines batches through a small worker pool.  JAX dispatch
is thread-safe (one client, one stream — the device serializes execution
in enqueue order), the ctypes rANS calls release the GIL, and host
fetches block only their own thread, so `depth=2` keeps one batch of
host work running under one batch of device work with no further
machinery.  Results are bit-identical to the serial loop (the codec
itself is deterministic; threads only change *when* work is enqueued).

Reference analog: none — AutoEncoderRGB_Journal.py:312-415 codes one
image at a time, fully serially.  This is the TPU-serving upgrade on top
of the already-batched path.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, List, Sequence

import numpy as np


class PipelinedCodec:
    """Wraps an RGBAFileCodec with a depth-bounded batch pipeline.

    depth=2 is the sweet spot: one batch in host code / transfer, one in
    device compute.  Higher depths only add queueing (the device is a
    single stream) and memory.
    """

    def __init__(self, codec, depth: int = 2):
        assert depth >= 1
        self.codec = codec
        self.depth = depth
        self._pool = ThreadPoolExecutor(max_workers=depth)

    # ------------------------------------------------------------ streams

    def encode_stream(self, batches: Iterable[tuple],
                      **kw) -> Iterator[List[bytes]]:
        """batches: iterable of (images, alphas) ndarray pairs.
        Yields the per-batch list of container blobs, in order.
        Extra kwargs (e.g. bbox=True) pass through to encode_batch."""
        yield from self._run(batches,
                             lambda ba: self.codec.encode_batch(*ba, **kw))

    def decode_stream(self, blob_batches: Iterable[Sequence[bytes]],
                      output: str = "float32", **kw) -> Iterator[np.ndarray]:
        """blob_batches: iterable of blob lists. Yields (B,H,W,4) arrays.
        Extra kwargs (e.g. interleave=2) pass through to decode_batch."""
        yield from self._run(blob_batches,
                             lambda bl: self.codec.decode_batch(
                                 list(bl), output=output, **kw))

    def roundtrip_stream(self, batches: Iterable[tuple],
                         output: str = "float32",
                         stream_format: str = "v64") -> Iterator[tuple]:
        """Encode AND decode each batch, pipelined; yields (blobs, rgba).
        This is the serving loop shape: full enc+dec per request batch."""
        def step(ba):
            blobs = self.codec.encode_batch(*ba, stream_format=stream_format)
            return blobs, self.codec.decode_batch(blobs, output=output)
        yield from self._run(batches, step)

    # ------------------------------------------------------------ plumbing

    def _run(self, items: Iterable, fn) -> Iterator:
        """Submit up to `depth` items ahead, yield results in order."""
        pending = []
        it = iter(items)
        try:
            while True:
                while len(pending) < self.depth:
                    try:
                        pending.append(self._pool.submit(fn, next(it)))
                    except StopIteration:
                        for f in pending:
                            yield f.result()
                        return
                yield pending.pop(0).result()
        finally:
            for f in pending:
                f.cancel()

    def close(self):
        self._pool.shutdown(wait=False)
