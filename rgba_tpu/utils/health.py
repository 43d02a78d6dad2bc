"""Chip-health canary + TPU-client hygiene for the official bench.

Round-3 post-mortem (VERDICT.md "What's weak" 1-2): BENCH_r03 was
captured on a chip/tunnel degraded ~5x (30.3 TF/s raw-matmul vs the
173 TF/s recorded on this chip at round 1) while a dying sweep's fate
was unresolved, and nothing in the official record could distinguish
the degraded environment from a code regression.  Two fixes live here:

* ``chip_health()`` — a raw 8192^3 bf16 matmul has no project code in
  it, so its TF/s measures the ENVIRONMENT; bench.py embeds it in every
  official record and flags <60% of the healthy reference as degraded.
* ``other_tpu_clients()`` — concurrent clients wedge the axon tunnel
  (CLAUDE.md one-client rule); bench.py refuses to measure while
  another rgba_tpu TPU process is alive.
"""

from __future__ import annotations

import os
import time

HEALTHY_TFS = 173.0  # round-1 measurement on this chip (PERFORMANCE.md)
DEGRADED_BELOW = 0.6  # fraction of HEALTHY_TFS


def chip_health(n: int = 8192, iters: int = 16) -> dict:
    """Raw-matmul TF/s + per-sync ms, measured in THIS process."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rgba_tpu.utils.benchmark import device_time

    key = jax.random.PRNGKey(0)
    # two distinct operand pairs: identical repeated executions can be
    # deduplicated by the runtime and would fake the timing
    mats = []
    for s in range(2):
        a = jax.device_put(jax.random.normal(
            jax.random.fold_in(key, s), (n, n), jnp.bfloat16))
        b = jax.device_put(jax.random.normal(
            jax.random.fold_in(key, s + 2), (n, n), jnp.bfloat16))
        mats.append((a, b))
    mm = jax.jit(lambda a, b: a @ b)
    sec = device_time(mm, mats, iters=iters, warmup=2)
    tflops = 2 * n ** 3 / sec / 1e12

    one = mm(*mats[0])
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(jax.device_get(one[0, 0]))
    sync_ms = (time.perf_counter() - t0) / 4 * 1e3

    frac = tflops / HEALTHY_TFS
    return {"matmul_tflops": round(tflops, 1),
            "sync_ms": round(sync_ms, 1),
            "healthy_frac": round(frac, 3),
            "degraded": frac < DEGRADED_BELOW}


_CLIENT_MARKERS = ("rgba_tpu", "rd_sweep", "tailpar_probe", "batch1_probe",
                   "chip_health", "bench.py", "watchdog.sh",
                   "validate_reference_weights")


def other_tpu_clients() -> list[tuple[int, str]]:
    """PIDs (not self/ancestors) whose cmdline looks like an rgba_tpu
    TPU client.  Detection only — kills are always BY PID, by a human
    or by ``tools/watchdog.sh --kill-stale`` reading its pidfiles."""
    me = os.getpid()
    ancestors = set()
    pid = me
    for _ in range(32):
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
        if pid <= 1:
            break
        ancestors.add(pid)
    out = []
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        pid = int(ent)
        if pid == me or pid in ancestors:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if ("python" in cmd or "watchdog" in cmd) and \
                any(m in cmd for m in _CLIENT_MARKERS):
            out.append((pid, cmd.strip()[:160]))
    return out
