"""Step-named checkpoints with the reference's resume semantics.

* files: <dir>/iter_<N>.ckpt (msgpack of the param/opt pytree), matching
  the reference's iter_<N>.pth.tar naming (trainRGB.py:68-69)
* the step is recovered by parsing the filename (load_model,
  trainRGB.py:90-96)
* rotating snapshots: keep only the latest until ``keep_after``, then keep
  everything (save_model_train, trainRGB.py:71-81; mask driver uses
  2000/595000, trainmask.py:65-76)
* loads are partial-tolerant: only intersecting leaves are restored
  (trainRGB.py:83-89)
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(tree: Any, directory: str, step: int,
                    prefix: str = "iter_") -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{prefix}{step}.ckpt")
    data = serialization.to_bytes(jax.device_get(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def save_rotating(tree: Any, directory: str, step: int, interval: int,
                  keep_after: int, prefix: str = "iter_") -> str:
    """Rotating snapshot: delete the previous one unless past keep_after."""
    path = save_checkpoint(tree, directory, step, prefix)
    if step <= keep_after:
        prev = os.path.join(directory, f"{prefix}{step - interval}.ckpt")
        if os.path.isfile(prev):
            os.remove(prev)
    return path


TORCH_SUFFIXES = (".pth.tar", ".pth", ".pt")


def _torch_kind(template: Any) -> str:
    """Infer which codec a param tree belongs to (for .pth.tar import):
    the mask encoder's first layer is ``conv0`` (MaskEncoder), the RGB
    encoder's is ``x1`` (AnalysisTransform)."""
    enc = template.get("encoder", {}) if isinstance(template, dict) else {}
    return "mask" if "conv0" in enc else "rgb"


def load_checkpoint(template: Any, path: str) -> Any:
    """Restore into `template` (same treedef); partial-tolerant on dicts.

    Reference torch checkpoints (``.pth.tar``/``.pth``/``.pt``,
    README.md:56-58 released weights) are auto-detected and imported via
    train/torch_import.py, so every ``-p``/``-pm`` flag and resume path
    accepts them directly like the reference's load_model
    (trainRGB.py:83-96)."""
    if path.endswith(TORCH_SUFFIXES):
        from .torch_import import convert_state_dict, load_pth_tar
        tmpl = jax.device_get(template)
        return convert_state_dict(load_pth_tar(path), tmpl,
                                  kind=_torch_kind(tmpl))
    with open(path, "rb") as f:
        data = f.read()
    try:
        return serialization.from_bytes(template, data)
    except (KeyError, ValueError):
        # partial load: merge intersecting keys only
        state = serialization.msgpack_restore(data)
        flat_t = dict(_flatten("", jax.device_get(template)))
        flat_s = dict(_flatten("", state))
        merged = {k: flat_s.get(k, v) for k, v in flat_t.items()}
        return _unflatten_like(template, merged)


def _flatten(prefix, tree):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(f"{prefix}/{k}", v)
    else:
        yield prefix, tree


def _unflatten_like(template, flat, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten_like(v, flat, f"{prefix}/{k}")
                for k, v in template.items()}
    return flat[prefix]


def step_from_path(path: str) -> int:
    """iter_<N> filename parse (trainRGB.py:90-96); 0 if absent."""
    m = re.search(r"iter_(\d+)\.", os.path.basename(path))
    return int(m.group(1)) if m else 0


def latest_checkpoint(directory: str, prefix: str = "iter_") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = re.match(rf"{prefix}(\d+)\.ckpt$", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, name), int(m.group(1))
    return best
