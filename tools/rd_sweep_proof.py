"""Multi-λ rate-distortion sweep proof on the real TPU.

The reference ships ten λ-sweep configs (examples/*.json) whose whole
point is a monotone RD curve: higher λ → more bits → higher PSNR
(trainRGB.py RD loss λ·255²·MSE + bpp).  This trains the RGB codec at
three λs against one shared trained mask codec, evaluates each with the
REAL bitstream on the same synthetic Kodak tree, and asserts the RD
ordering — the strongest cheap end-to-end evidence that the training
stack (losses, entropy models, aux optimizer, checkpointing) optimizes
what it claims.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
       python -u tools/rd_sweep_proof.py [steps_per_run] (default 800)
"""

import json
import os
import sys
import time

import jax
import numpy as np

from rgba_tpu.core.config import TrainConfig
from rgba_tpu.data.loader import BatchLoader
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.parallel.mesh import shard_batch
from rgba_tpu.train.checkpoint import latest_checkpoint, load_checkpoint, \
    save_checkpoint
from rgba_tpu.train.loops import MaskTrainer, RGBTrainer
from tools.train_proof import SynthDataset

LAMBDAS = (256, 1024, 4096)


def train_one(kind, lam, steps, outdir):
    cfg = TrainConfig(train_lambda=lam, batch_size=16, cal_step=1,
                      tot_step=steps, aux_lr=1e-3, curriculum_step=0,
                      snapshot_freq=10 ** 9, save_model_freq=10 ** 9,
                      compute_dtype="bfloat16")
    cls = MaskTrainer if kind == "mask" else RGBTrainer
    ckdir = os.path.join(outdir, f"{kind}_{lam}_ck")
    # crash/extend resume: params-only from the latest iter_N.ckpt (the
    # reference's own resume semantics — torch state_dict has no optimizer
    # state either, trainRGB.py:83-96)
    start, params = 0, None
    latest = latest_checkpoint(ckdir)
    if latest is not None:
        from rgba_tpu.train.checkpoint import step_from_path
        start = step_from_path(latest)
        if start >= steps:
            print(f"[{kind} λ={lam}] already trained to {start} — reusing",
                  flush=True)
            return ckdir
        print(f"[{kind} λ={lam}] resuming from step {start}", flush=True)
    trainer = cls(cfg, ckdir)
    loader = BatchLoader(SynthDataset(n=256, hw=256),
                         batch_size=cfg.batch_size, num_workers=4, seed=0)
    it = iter(loader)
    if latest is not None:
        tmpl = jax.device_get(trainer.init_state(next(it)).params)
        params = load_checkpoint(tmpl, latest)
    state = trainer.init_state(next(it), params=params, step=start)
    step_fn = trainer.compiled_step()
    rng = jax.random.PRNGKey(lam + start)
    t0 = time.time()
    for i in range(start, steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        rng, sub = jax.random.split(rng)
        db = shard_batch(trainer.mesh,
                         {k: batch[k] for k in trainer.batch_keys})
        state, metrics = step_fn(state, db, sub)
        if (i + 1) % 400 == 0:
            m = jax.device_get(metrics)
            print(f"[{kind} λ={lam}] step {i}: "
                  f"rd={float(m['rd_loss']):.3f} "
                  f"bpp={float(m['bpp']):.4f}", flush=True)
        if (i + 1) % 800 == 0 and (i + 1) < steps:
            save_checkpoint(state.params, ckdir, i + 1)
    save_checkpoint(state.params, ckdir, steps)
    print(f"[{kind} λ={lam}] steps {start}..{steps} in "
          f"{time.time() - t0:.0f}s", flush=True)
    return ckdir


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    outdir = "/tmp/rd_sweep"
    os.makedirs(outdir, exist_ok=True)
    print(jax.devices(), flush=True)

    mask_ck = train_one("mask", 1024, steps, outdir)
    rgb_cks = {lam: train_one("rgb", lam, steps, outdir) for lam in LAMBDAS}

    import jax.numpy as jnp
    from rgba_tpu.data.synthetic import write_synthetic_kodak_tree
    from rgba_tpu.eval.kodak import evaluate_kodak
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    m0 = jnp.zeros((1, 256, 256, 1))
    x0 = jnp.zeros((1, 256, 256, 3))
    mask_tmpl = mask_model.init({"params": key, "noise": key}, m0,
                                training=False)["params"]
    rgb_tmpl = rgb_model.init({"params": key, "noise": key}, x0, m0, m0,
                              mask_pyramid(m0), training=False)["params"]
    mask_params = load_checkpoint(jax.device_get(mask_tmpl),
                                  latest_checkpoint(mask_ck))

    tree = os.path.join(outdir, "kodak")
    write_synthetic_kodak_tree(tree, n_images=3, height=512, width=768)

    points = {}
    for lam in LAMBDAS:
        rgb_params = load_checkpoint(jax.device_get(rgb_tmpl),
                                     latest_checkpoint(rgb_cks[lam]))
        avg = evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                             tree, step=steps, real_codec=True)
        points[lam] = {k: round(float(v), 6) for k, v in avg.items()}
        print(f"λ={lam}: {json.dumps(points[lam])}", flush=True)

    bpps = [points[lam]["real_bpp"] for lam in LAMBDAS]
    psnrs = [points[lam]["psnr"] for lam in LAMBDAS]
    print(f"RD sweep: bpp={bpps} psnr={psnrs}", flush=True)
    # record the points BEFORE asserting — a failed ordering check (e.g.
    # an undertrained high-λ point) should still leave the data on disk,
    # and the checkpoints allow extending the run with a larger step count
    with open(os.path.join(outdir, "rd_points.json"), "w") as f:
        json.dump(points, f, indent=2)
    assert all(np.isfinite(v) and v > 0 for v in bpps), bpps
    # monotone rate in λ — the core RD contract
    assert bpps[0] < bpps[1] < bpps[2], bpps
    # distortion should not get WORSE as λ (and rate) grow; allow noise
    assert psnrs[2] > psnrs[0] - 0.1, psnrs
    print("rd_sweep_proof OK", flush=True)


if __name__ == "__main__":
    main()
