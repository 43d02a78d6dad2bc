"""On-chip measurement: does packed_dse speed up TRAINING steps?

The packed block-diag DSE relayout is pure XLA and differentiable, so
unlike the Pallas remat-VJP kernels it is a candidate for training
policies too.  This runs real RGBTrainer steps with packed_dse on/off
(same data/seed) and reports s/step + loss agreement.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
       python -u tools/train_packed_smoke.py [steps]
"""

import dataclasses
import sys

import jax

from rgba_tpu.core.precision import BF16_POLICY
from tools.train_fused_smoke import run


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    outdir = "/tmp/train_packed_smoke"
    print(jax.devices(), flush=True)
    packed = dataclasses.replace(BF16_POLICY, packed_dse=True)
    lq = run(packed, "packed_dse", steps, outdir)
    lp = run(BF16_POLICY, "plain_bf16", steps, outdir)
    rel = abs(lq[-1] - lp[-1]) / max(abs(lp[-1]), 1e-6)
    print(f"final-loss relative gap packed vs plain: {rel:.4f}", flush=True)
    assert rel < 0.05, rel
    print("train_packed_smoke OK", flush=True)


if __name__ == "__main__":
    main()
