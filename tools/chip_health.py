"""Chip-health canary: raw 8192^3 bf16 matmul TF/s + per-sync latency.

Round-3 post-mortem (VERDICT.md): the official BENCH_r03 was captured on
a chip/tunnel degraded ~5x (30.3 TF/s on this probe vs the 173 TF/s
recorded at round 1), and nothing in the record distinguished that from
a code regression.  A raw matmul has no project code in it, so its TF/s
measures the ENVIRONMENT.  bench.py embeds the same measurement
(rgba_tpu/utils/health.py) as a `chip_health` detail in every record.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/chip_health.py
"""

import json

import jax

from rgba_tpu.utils.health import chip_health

if __name__ == "__main__":
    print(jax.devices(), flush=True)
    print(json.dumps(chip_health()), flush=True)
