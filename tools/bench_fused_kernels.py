"""On-chip check + timing of the fused Pallas kernels vs their XLA paths.

Usage: python tools/bench_fused_kernels.py [gate|dse|all]

Model shapes (batch 16, Kodak geometry):
  * WinGateAttention C=192 @ 128x192 (H/4) and C=80 @ 64x96 (H/8)
  * SimplifiedAttention C=192 @ 64x96 and C=80 @ 32x48 (mask codec)
  * DSE cio=3 @ 512x768 (RGB tail) and cio=1 @ 512x768 (mask tail)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgba_tpu.core.precision import BF16_POLICY, Policy
from rgba_tpu.utils.benchmark import device_time

import dataclasses

FUSED = dataclasses.replace(BF16_POLICY, fused_gate_chain=True,
                            fused_dse=True)
B = 16


def _inputs(key, shape, n=4, dtype=jnp.bfloat16):
    ks = jax.random.split(key, n)
    return [jax.random.normal(k, shape, dtype) for k in ks]


def check_and_time(name, plain_fn, fused_fn, inputs, tol=0.08):
    o_p = np.asarray(plain_fn(*inputs[0]), np.float32)
    o_f = np.asarray(fused_fn(*inputs[0]), np.float32)
    err = np.abs(o_p - o_f).max()
    rel = err / max(np.abs(o_p).max(), 1e-6)
    t_p = device_time(plain_fn, inputs, iters=10)
    t_f = device_time(fused_fn, inputs, iters=10)
    print(f"{name:40s} xla {t_p * 1e3:7.2f} ms  fused {t_f * 1e3:7.2f} ms "
          f"({t_p / t_f:4.2f}x)  maxerr {err:.4f} (rel {rel:.4f})")
    assert rel < tol, f"{name}: fused kernel diverges (rel {rel})"


def bench_gate():
    from rgba_tpu.ops.attention import SimplifiedAttention, WinGateAttention
    key = jax.random.PRNGKey(0)
    for dim, h, w, ws, ss in ((192, 128, 192, 8, 4), (80, 64, 96, 4, 2)):
        plain = WinGateAttention(dim, num_heads=8, window_size=ws,
                                 shift_size=ss, policy=BF16_POLICY)
        fused = WinGateAttention(dim, num_heads=8, window_size=ws,
                                 shift_size=ss, policy=FUSED)
        x0 = jnp.zeros((B, h, w, dim), jnp.bfloat16)
        a0 = jnp.ones((B, h, w, 1), jnp.bfloat16)
        params = plain.init(key, x0, a0)
        xs = _inputs(key, (B, h, w, dim))
        alpha = (jax.random.uniform(key, (B, h, w, 1)) > 0.3).astype(
            jnp.bfloat16)
        p_fn = jax.jit(lambda x, a, m=plain: m.apply(params, x, a))
        f_fn = jax.jit(lambda x, a, m=fused: m.apply(params, x, a))
        check_and_time(f"WinGate C={dim} {h}x{w}", p_fn, f_fn,
                       [(x, alpha) for x in xs])

    for dim, h, w in ((192, 64, 96), (80, 32, 48)):
        plain = SimplifiedAttention(dim, policy=BF16_POLICY)
        fused = SimplifiedAttention(dim, policy=FUSED)
        x0 = jnp.zeros((B, h, w, dim), jnp.bfloat16)
        params = plain.init(key, x0)
        xs = _inputs(key, (B, h, w, dim))
        p_fn = jax.jit(lambda x, m=plain: m.apply(params, x))
        f_fn = jax.jit(lambda x, m=fused: m.apply(params, x))
        check_and_time(f"SimplifiedAttn C={dim} {h}x{w}", p_fn, f_fn,
                       [(x,) for x in xs])


def bench_dse():
    from rgba_tpu.ops.enhance import DSE
    key = jax.random.PRNGKey(1)
    for cio, leaky in ((3, False), (1, True)):
        plain = DSE(in_ch=cio, leaky=leaky, policy=BF16_POLICY)
        fused = DSE(in_ch=cio, leaky=leaky, policy=FUSED)
        x0 = jnp.zeros((B, 512, 768, cio), jnp.bfloat16)
        params = plain.init(key, x0)
        xs = _inputs(key, (B, 512, 768, cio))
        p_fn = jax.jit(lambda x, m=plain: m.apply(params, x))
        f_fn = jax.jit(lambda x, m=fused: m.apply(params, x))
        check_and_time(f"DSE cio={cio} 512x768", p_fn, f_fn,
                       [(x,) for x in xs])


def bench_gdn():
    from rgba_tpu.ops.gdn import GDN
    key = jax.random.PRNGKey(2)
    for dim, h, w, inv in ((192, 256, 384, False), (192, 256, 384, True),
                           (192, 128, 192, False)):
        plain = GDN(inverse=inv, policy=BF16_POLICY)
        fused = GDN(inverse=inv,
                    policy=dataclasses.replace(BF16_POLICY, fused_gdn=True))
        x0 = jnp.zeros((B, h, w, dim), jnp.bfloat16)
        params = plain.init(key, x0)
        xs = _inputs(key, (B, h, w, dim))
        p_fn = jax.jit(lambda x, m=plain: m.apply(params, x))
        f_fn = jax.jit(lambda x, m=fused: m.apply(params, x))
        name = "IGDN" if inv else "GDN"
        check_and_time(f"{name} C={dim} {h}x{w}", p_fn, f_fn,
                       [(x,) for x in xs])


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(jax.devices())
    t0 = time.time()
    if which in ("gate", "all"):
        bench_gate()
    if which in ("dse", "all"):
        bench_dse()
    if which in ("gdn", "all"):
        bench_gdn()
    print(f"total {time.time() - t0:.0f}s")
