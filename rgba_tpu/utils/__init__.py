from .pytree import flat_paths, param_count, tree_summary
