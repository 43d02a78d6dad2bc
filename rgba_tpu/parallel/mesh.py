"""Device mesh + data-parallel sharding.

The reference's latent intent was torch DataParallel over gpu_num GPUs
(commented out, trainRGB.py:374; SURVEY §2.3).  The TPU-native equivalent:
a 1-D ``data`` mesh, batches sharded along it with NamedSharding, params
replicated; jit inserts the gradient all-reduce (psum over ICI) from the
sharding — no NCCL-style code.  A ``space`` axis can be added for spatial
sharding of very large images (windows are independent; SURVEY §5).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices if num_devices > 0 else len(devs)
    return Mesh(np.asarray(devs[:n]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict sharded along the data axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
