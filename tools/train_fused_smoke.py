"""On-chip proof that the fused Pallas kernels train (remat-VJP).

Runs real RGBTrainer steps with fused_win_attn=True (forward = Pallas
window-attention kernel, backward = rematerialized XLA formulation) next
to the plain bf16 policy: same data, both must descend with finite
grads.  Grad-parity itself is pinned on CPU by tests/test_remat_vjp.py;
this exercises the custom_vjp on the real TPU inside jit+grad+optax.

Usage: python -u tools/train_fused_smoke.py [steps]
"""

import dataclasses
import sys
import time

import jax
import numpy as np

from rgba_tpu.core.config import TrainConfig
from rgba_tpu.core.precision import BF16_POLICY
from rgba_tpu.data.loader import BatchLoader
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.parallel.mesh import shard_batch
from rgba_tpu.train.loops import RGBTrainer
from tools.train_proof import SynthDataset


def run(policy, label, steps, outdir):
    cfg = TrainConfig(train_lambda=1024, batch_size=8, cal_step=1,
                      tot_step=steps, aux_lr=1e-3, curriculum_step=0,
                      snapshot_freq=10 ** 9, save_model_freq=10 ** 9,
                      compute_dtype="bfloat16")
    trainer = RGBTrainer(cfg, f"{outdir}/{label}",
                         model=RGBCodec(policy=policy))
    loader = BatchLoader(SynthDataset(n=64, hw=256),
                         batch_size=cfg.batch_size, num_workers=2, seed=0)
    it = iter(loader)
    example = next(it)
    state = trainer.init_state(example)
    step_fn = trainer.compiled_step()
    rng = jax.random.PRNGKey(0)
    losses = []
    t0 = time.time()
    for i in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        rng, sub = jax.random.split(rng)
        db = shard_batch(trainer.mesh,
                         {k: batch[k] for k in trainer.batch_keys})
        state, metrics = step_fn(state, db, sub)
        losses.append(metrics["rd_loss"])
    losses = [float(jax.device_get(v)) for v in losses]
    dt = time.time() - t0
    assert all(np.isfinite(v) for v in losses), losses
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    print(f"[{label}] rd {losses[0]:.2f} -> {losses[-1]:.2f} over {steps} "
          f"steps, {dt / steps:.2f}s/step incl pipeline", flush=True)
    return losses


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    outdir = "/tmp/train_fused_smoke"
    print(jax.devices(), flush=True)
    fused = dataclasses.replace(BF16_POLICY, fused_win_attn=True)
    lf = run(fused, "fused_win_attn", steps, outdir)
    lp = run(BF16_POLICY, "plain_bf16", steps, outdir)
    # same seed/data: the two runs should track closely (bf16 + kernel
    # rounding differences only)
    rel = abs(lf[-1] - lp[-1]) / max(abs(lp[-1]), 1e-6)
    print(f"final-loss relative gap fused vs plain: {rel:.4f}", flush=True)
    assert rel < 0.05, rel
    print("train_fused_smoke OK", flush=True)


if __name__ == "__main__":
    main()
