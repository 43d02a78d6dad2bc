"""Honest device timing under the axon TPU tunnel.

On this runtime ``block_until_ready`` returns before remote execution
finishes, so naive timing measures host dispatch only.  The reliable
protocol: enqueue N executions (distinct inputs — repeated (fn, args)
pairs can be deduplicated), then force a HOST FETCH of a scalar derived
from the last output; the single TPU stream executes in order, so the
fetch waits for the whole queue.  Per-call host sync costs ~26 ms through
the tunnel, so never sync inside the loop.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * leaf.ndim
    return np.asarray(jax.device_get(leaf[idx]))


def device_time(fn: Callable, inputs: Sequence[tuple], iters: int = 20,
                warmup: int = 1) -> float:
    """Average seconds per call of fn(*inputs[i % len]) on device."""
    out = None
    for w in range(warmup):
        out = fn(*inputs[w % len(inputs)])
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*inputs[i % len(inputs)])
    _sync(out)
    return (time.perf_counter() - t0) / iters
