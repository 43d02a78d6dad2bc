"""One-buffer parameter packing for jitted serving / eval passes.

Round-4 finding (PERFORMANCE.md "forward-collapse investigation"): the
axon tunnel charges a fixed ~14 ms *per argument buffer* per execution,
so a jitted pass taking the 772-leaf param pytree as a runtime argument
costs ~11 s/call while the identical program with the params packed into
ONE flat buffer runs at full speed (probe: tools/argleaf_probe.py).
Packing is harmless on production hosts — fewer runtime argument buffers
is never worse — and it preserves the serving contract that mattered in
the first place: checkpoints can be swapped with `repack` WITHOUT
recompiling any cached executable, because the unravel closure depends
only on the tree *structure*, which checkpoint swaps keep fixed.

Usage:
    fp = FlatParams(params)           # one device buffer
    fn = jax.jit(lambda flat, x: model.apply(
        {"params": fp.unravel(flat)}, x))
    fn(fp.flat, x)                    # full speed
    fp.repack(new_params)             # same structure -> no retrace
"""

from __future__ import annotations

import jax
from jax.flatten_util import ravel_pytree


class FlatParams:
    """A param pytree packed into a single device buffer.

    `unravel` is stable across `repack` calls with the same tree
    structure, so jitted functions that close over it (via an attribute
    read at trace time) never retrace on a checkpoint swap.
    """

    def __init__(self, params, device=None):
        # `device`: optional jax.device_put destination — multi-chip
        # serving passes a replicated NamedSharding so the buffer lives
        # on every mesh device (a single-device-committed arg would
        # clash with mesh-sharded activations under jit)
        self._device = device
        flat, unravel = ravel_pytree(params)
        self.flat = jax.device_put(flat, device)
        self.unravel = unravel
        self._treedef = jax.tree_util.tree_structure(params)

    def repack(self, params):
        """Point at a new param tree.

        Same structure reuses the existing unravel (leaf order is
        deterministic given the structure), keeping every cached
        executable valid; a different structure rebuilds it (callers'
        jits then retrace on first use — correct, just slower once).
        """
        treedef = jax.tree_util.tree_structure(params)
        if treedef != self._treedef:
            flat, self.unravel = ravel_pytree(params)
            self._treedef = treedef
        else:
            flat, _ = ravel_pytree(params)
        self.flat = jax.device_put(flat, self._device)
        return self

    @property
    def tree(self):
        """Rebuild the tree (host-side uses, e.g. CDF table extraction)."""
        return self.unravel(self.flat)
