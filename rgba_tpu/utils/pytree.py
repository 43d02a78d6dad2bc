"""Param-tree utilities (the TPU-world counterpart of the reference's
state-dict buffer helpers, layers/utils.py:33-131 — there the problem is
resizing registered CDF buffers on load; here checkpoints never store CDF
tables, they are rebuilt from params, so the helpers reduce to tree
introspection used by the importer, checkpointing and debugging)."""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def flat_paths(tree, prefix: str = "") -> Iterator[Tuple[str, object]]:
    """Yield (slash/path, leaf) pairs of a nested-dict param tree."""
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from flat_paths(tree[k], f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tree


def param_count(tree) -> int:
    return sum(int(np.prod(np.shape(leaf))) for _, leaf in flat_paths(tree))


def tree_summary(tree, max_rows: int = 0) -> str:
    rows = [f"{p}: {tuple(np.shape(l))}" for p, l in flat_paths(tree)]
    if max_rows and len(rows) > max_rows:
        rows = rows[:max_rows] + [f"... (+{len(rows) - max_rows} more)"]
    rows.append(f"total params: {param_count(tree):,}")
    return "\n".join(rows)
