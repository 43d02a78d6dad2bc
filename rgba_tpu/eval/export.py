"""StableHLO export of serving programs (`jax.export`).

Deployment artifact story: lower + serialize a jitted serving forward
ONCE, ship the bytes, and execute them from any process with jax
installed — no rgba_tpu model code, flax module tree, or checkpoint
loading at serve time, and no risk of tracing drift between the process
that validated the model and the process that serves it.

The reference has no analog (PyTorch eval re-runs Python every call,
`trainRGB.py:258-334`); this is the TPU-native deployment upgrade:
XLA's AOT path through StableHLO, the platform-checked, versioned
serialization jax guarantees forward compatibility for.

Notes
-----
- Artifacts record their lowering platforms. Export with
  ``platforms=("tpu",)`` for deployment, ``("cpu",)`` for tests, or both
  to get one artifact that runs anywhere.
- ``SERVE_POLICY``'s fused Pallas attention lowers to the
  ``tpu_custom_call`` Mosaic custom call, which jax.export only admits
  with an explicit opt-out of the stable-custom-call check (Mosaic
  kernels are forward-compatible across minor jax versions but not
  guaranteed like pure StableHLO). ``allow_tpu_custom_calls=True`` opts
  in; exporting a pure-XLA policy (e.g. ``packed_dse`` without
  ``fused_win_attn``) produces a fully-stable artifact.
- Params can be bundled (baked into the program as constants — one
  self-contained artifact) or left as a runtime argument (small artifact,
  weights loaded separately; needed if one program serves many lambda
  operating points).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
from jax import export as jax_export


def export_jitted(fn: Callable, example_args: Sequence[Any],
                  platforms: Sequence[str] = ("tpu",),
                  allow_tpu_custom_calls: bool = True) -> jax_export.Exported:
    """Lower `fn(*example_args)` for `platforms` and return the Exported.

    `fn` is wrapped in jax.jit if it isn't already jitted.
    """
    if not hasattr(fn, "lower"):
        fn = jax.jit(fn)
    disabled = []
    if allow_tpu_custom_calls:
        disabled.append(
            jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"))
    return jax_export.export(fn, platforms=tuple(platforms),
                             disabled_checks=disabled)(*example_args)


def export_serving_forward(model, params, example_batch,
                           platforms: Sequence[str] = ("tpu",),
                           bundle_params: bool = True,
                           allow_tpu_custom_calls: bool = True,
                           ) -> jax_export.Exported:
    """Export a flax serving forward: `model.apply(params, *batch)`.

    model: any flax module whose apply takes (params, *example_batch) —
      RGBAPipeline, RGBCodec, MaskCodec.
    example_batch: tuple of arrays fixing the serving shapes/dtypes
      (shapes are static; export one artifact per serving geometry,
      e.g. batch 16 @ 768x512).
    bundle_params=True bakes the weights in as constants (self-contained
      artifact); False leaves params as the first runtime argument.
    """
    # training=False is passed EXPLICITLY: all three supported models take
    # the kwarg, and relying on its default would silently export the
    # training path (noise quantization) if a module default ever changed —
    # nothing downstream asserts which path was traced into the artifact.
    if bundle_params:
        fn = lambda *batch: model.apply(params, *batch, training=False)
        args = tuple(example_batch)
    else:
        fn = lambda p, *batch: model.apply(p, *batch, training=False)
        args = (params,) + tuple(example_batch)
    return export_jitted(fn, args, platforms=platforms,
                         allow_tpu_custom_calls=allow_tpu_custom_calls)


def save_artifact(exported: jax_export.Exported, path: str) -> int:
    """Serialize to `path`; returns the byte size."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_artifact(path: str) -> jax_export.Exported:
    """Deserialize an artifact. Run it with `artifact.call(*args)`
    (wrap in jax.jit for repeated dispatch: `jax.jit(artifact.call)`)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
