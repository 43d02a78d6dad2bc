"""Multi-host initialization (SPMD over ICI within a slice, DCN across).

The reference has no distributed backend (SURVEY §2.3); the TPU-native
equivalent is jax.distributed + a global mesh — XLA places the gradient
all-reduce on ICI automatically when the data axis spans a slice.

Usage on each host of a multi-host slice / multi-slice job:

    from rgba_tpu.parallel.distributed import initialize, global_mesh
    initialize()                      # reads TPU env (or explicit args)
    mesh = global_mesh()              # ("data",) over ALL global devices

Single-process runs are a no-op.  Cannot be integration-tested in this
single-host environment; the per-host sharded-batch path is identical to
the one validated on the 8-device virtual mesh (tests/test_train.py).
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU auto-detection; no-op if already
    initialized or single-process."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes is None:
        # TPU pods auto-configure from the environment; on single host this
        # simply does nothing useful, so skip to avoid a hang.
        if jax.process_count() > 1:
            jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    _initialized = True


def global_mesh():
    """1-D data mesh over every device in the job (all hosts)."""
    return make_mesh(devices=jax.devices())


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should load (data loading is
    per-host; each host feeds its local shard of the data axis)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
