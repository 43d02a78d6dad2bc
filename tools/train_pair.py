"""Train ONE mask (λ=1024) + ONE RGB (λ given) codec pair on the real
TPU and leave /tmp/rd_sweep checkpoints for the trained-weights probes
(int8_quality_probe, deadzone_probe, rate_gate_codec_probe,
preview_probe all load from there via load_trained_params).

Half the TPU time of the full rd_sweep_proof λ ladder — use this to
restore probe checkpoints after a /tmp wipe.  Resumable: re-run after a
tunnel wedge and it continues from the latest iter_N.ckpt.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
       python -u tools/train_pair.py [steps=800] [lam=4096]
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rd_sweep_proof import train_one


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    lam = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    outdir = "/tmp/rd_sweep"
    os.makedirs(outdir, exist_ok=True)
    print(jax.devices(), flush=True)
    train_one("mask", 1024, steps, outdir)
    train_one("rgb", lam, steps, outdir)
    print("train_pair OK", flush=True)


if __name__ == "__main__":
    main()
