"""Dtype policy: fp32 parameters, optionally bf16 activations.

The reference instantiates a CUDA GradScaler it never uses
(trainRGB.py:157); on TPU the idiomatic equivalent is straight bf16 compute
with fp32 parameters and fp32 entropy/likelihood math — no loss scaling.

``precision`` matters on TPU: fp32 convs/dots default to bf16 MXU passes
(Precision.DEFAULT).  The fp32 parity policy therefore pins HIGHEST; the
bf16 speed policy keeps DEFAULT (inputs are already bf16).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32   # set bfloat16 for TPU speed
    entropy_dtype: Any = jnp.float32   # likelihood math stays fp32
    precision: Any = jax.lax.Precision.HIGHEST
    # inference-only: route masked window attention / the DSE tail / the
    # gated ResidualUnit chains through fused Pallas kernels (no custom
    # VJP yet — keep False for training)
    fused_win_attn: bool = False
    fused_dse: bool = False
    fused_gate_chain: bool = False
    fused_gdn: bool = False
    # pure-XLA DSE relayout: pack 4 images into the channel dim with
    # block-diag kron(I,w) kernels so the 32-ch convs fill 128 lanes —
    # 2.27x on v5e (ops/enhance.py:dse_packed_xla). Differentiable; off in
    # parity policies because the reordering shifts bf16 rounding.
    packed_dse: bool = False
    # serving-only: dynamic W8A8 int8 convs (ops/quant.py).  Measured
    # 0.76x end-to-end vs bf16 serve on v5e (PERFORMANCE.md int8 section)
    # — the per-conv quantize/dequant HBM passes outweigh the 2x int8 MXU
    # rate on these bandwidth-bound shapes; kept for API completeness and
    # denser-model configs.  No gradient (round): never set in training.
    int8_conv: bool = False

    @property
    def gelu_kind(self) -> str:
        return "gelu_erf" if self.compute_dtype == jnp.float32 else "gelu_tanh"

    def cast_in(self, x):
        return x.astype(self.compute_dtype)

    def cast_entropy(self, x):
        return x.astype(self.entropy_dtype)

    def gelu(self, x):
        """fp32 parity: exact erf GELU (torch nn.GELU default). bf16 speed:
        tanh approximation — measured 2x faster on VPU (the erf on big
        activations costs more than the adjacent convs) and the |error|
        ~1e-3 is below bf16 resolution."""
        exact = self.compute_dtype == jnp.float32
        return jax.nn.gelu(x, approximate=not exact)


DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16,
                     precision=jax.lax.Precision.DEFAULT)
# serving: bf16 + fused Pallas attention (inference only).
# fused_dse stays off: the kernel is correct (tests run it in interpret
# mode) but on-chip the 32-channel intermediates pad 4x on the 128-lane
# axis and dynamic lane slices need 128-alignment — the planned fix is a
# channels-in-width relayout (see ops/pallas/dse.py docstring).
SERVE_POLICY = Policy(compute_dtype=jnp.bfloat16,
                      precision=jax.lax.Precision.DEFAULT,
                      fused_win_attn=True,
                      fused_dse=False,
                      packed_dse=True)
# int8 serving: SERVE_POLICY + dynamic W8A8 convs.  Measured SLOWER than
# bf16 serve end-to-end (46.3 vs 60.9 img/s) at PSNR parity — opt-in
# only; see PERFORMANCE.md "int8 MXU probe" for the full verdict.
SERVE_INT8_POLICY = dataclasses.replace(SERVE_POLICY, int8_conv=True)


def policy_from_str(name: str) -> Policy:
    if name in ("bfloat16", "bf16"):
        return BF16_POLICY
    if name in ("float32", "fp32"):
        return DEFAULT_POLICY
    if name in ("serve", "serving"):
        return SERVE_POLICY
    if name in ("serve-int8", "int8"):
        return SERVE_INT8_POLICY
    raise ValueError(f"unknown compute dtype: {name}")
