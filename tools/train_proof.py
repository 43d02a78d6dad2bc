"""Sustained on-TPU training proof (VERDICT r1 item 6).

Runs a few hundred bf16 training steps of BOTH codecs on-chip with the
real Trainer (channel-AR entropy, aux optimizer, value grad clip,
curriculum), logs loss/bpp curves, then exercises the crash-resume cycle:
checkpoint -> fresh trainer -> resume from disk -> one more step + eval
forward; asserts the resumed state reproduces the pre-crash loss on the
same batch.

Usage: python -u tools/train_proof.py [steps] (default 300)
Writes curves to PERFORMANCE-quoted /tmp/train_proof/{mask,rgb}_curve.jsonl
"""

import json
import os
import sys
import tempfile
import time

import jax
import numpy as np

from rgba_tpu.core.config import TrainConfig
from rgba_tpu.data.loader import BatchLoader
from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.parallel.mesh import shard_batch
from rgba_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
from rgba_tpu.train.loops import MaskTrainer, RGBTrainer


class SynthDataset:
    def __init__(self, n=256, hw=256):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def get(self, idx, epoch_seed=0):
        b = synthetic_rgba_batch(1, self.hw, self.hw, seed=idx)
        return {k: v[0] for k, v in b.items()}


def run(kind: str, steps: int, outdir: str):
    cfg = TrainConfig(train_lambda=1024, batch_size=16, cal_step=1,
                      print_freq=50, tot_step=steps, aux_lr=1e-3,
                      snapshot_freq=10 ** 9, save_model_freq=10 ** 9,
                      curriculum_step=0, compute_dtype="bfloat16")
    cls = MaskTrainer if kind == "mask" else RGBTrainer
    ckdir = os.path.join(outdir, f"{kind}_ck")
    trainer = cls(cfg, ckdir)
    ds = SynthDataset(n=256, hw=256)
    loader = BatchLoader(ds, batch_size=cfg.batch_size, num_workers=4, seed=0)
    it = iter(loader)
    example = next(it)
    state = trainer.init_state(example)
    step_fn = trainer.compiled_step()
    rng = jax.random.PRNGKey(0)

    curve_path = os.path.join(outdir, f"{kind}_curve.jsonl")
    curve = open(curve_path, "w")
    t0 = time.time()
    pending = []
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
        pending.append((i, metrics))
        if len(pending) == 25 or i == steps - 1:
            for j, m in pending:
                m = jax.device_get(m)
                curve.write(json.dumps(
                    {"step": j, "rd_loss": float(m["rd_loss"]),
                     "bpp": float(m["bpp"]),
                     "mse": float(m["mse_loss"])}) + "\n")
            print(f"[{kind}] step {i}: rd={float(m['rd_loss']):.3f} "
                  f"bpp={float(m['bpp']):.4f} mse={float(m['mse_loss']):.6f}",
                  flush=True)
            pending = []
    dt = time.time() - t0
    curve.close()
    img_s = steps * cfg.batch_size / dt
    print(f"[{kind}] {steps} steps in {dt:.1f}s = {img_s:.1f} img/s "
          f"(incl. host pipeline)", flush=True)

    # ---- crash-resume: save, rebuild everything, reload, same-batch parity
    from rgba_tpu.train.checkpoint import save_checkpoint
    save_checkpoint(state.params, ckdir, steps)
    rng2 = jax.random.PRNGKey(99)
    db = shard_batch(trainer.mesh, {k: example[k] for k in trainer.batch_keys})
    ref_state, ref_metrics = step_fn(state, db, rng2)
    ref_loss = float(jax.device_get(ref_metrics["rd_loss"]))

    trainer2 = cls(cfg, ckdir)
    path = latest_checkpoint(ckdir)
    state2 = trainer2.init_state(example)
    params = load_checkpoint(jax.device_get(state2.params), path)
    from rgba_tpu.train.checkpoint import step_from_path
    state2 = trainer2.init_state(example, params=params,
                                 step=step_from_path(path))
    assert int(state2.step) == steps
    _, metrics2 = trainer2.compiled_step()(state2, db, rng2)
    loss2 = float(jax.device_get(metrics2["rd_loss"]))
    print(f"[{kind}] resume parity: pre-crash {ref_loss:.6f} "
          f"resumed {loss2:.6f}", flush=True)
    # the step's reported loss is computed from the incoming params (before
    # the update), so a faithful checkpoint round-trip must reproduce it;
    # Adam moments restarting fresh (reference semantics — torch.save of
    # net.state_dict() only, trainRGB.py:68-69) does not affect it
    assert abs(loss2 - ref_loss) / max(abs(ref_loss), 1e-6) < 1e-4
    first = json.loads(open(curve_path).readline())
    print(f"[{kind}] rd {first['rd_loss']:.2f} -> {ref_loss:.2f}", flush=True)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    outdir = "/tmp/train_proof"
    os.makedirs(outdir, exist_ok=True)
    print(jax.devices(), flush=True)
    run("mask", steps, outdir)
    run("rgb", steps, outdir)
    print("train_proof OK", flush=True)
