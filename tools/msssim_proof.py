"""MS-SSIM-distortion training proof on the real TPU.

The reference carries masked MS-SSIM as a commented-out distortion
(trainRGB.py:183); rgba_tpu exposes it as `distortion="msssim"`.  This
trains the RGB codec with that loss (sharing the RD-sweep's trained mask
codec), evaluates with the real bitstream on the same synthetic Kodak
tree, and asserts the point of the option: the msssim-trained model
must achieve a HIGHER MS-SSIM per bit than the mse-trained model — the
optimization target actually moves the measured metric.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
       python -u tools/msssim_proof.py [steps=2400] [lam=64]

Requires the RD-sweep checkpoints (tools/rd_sweep_proof.py) under
/tmp/rd_sweep for the mask codec and the mse comparison point.
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgba_tpu.core.config import TrainConfig
from rgba_tpu.data.loader import BatchLoader
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.parallel.mesh import shard_batch
from rgba_tpu.train.checkpoint import (latest_checkpoint, load_checkpoint,
                                       save_checkpoint, step_from_path)
from rgba_tpu.train.loops import RGBTrainer
from tools.train_proof import SynthDataset

OUTDIR = "/tmp/rd_sweep"


def train_msssim(lam, steps):
    cfg = TrainConfig(train_lambda=lam, batch_size=16, cal_step=1,
                      tot_step=steps, aux_lr=1e-3, curriculum_step=0,
                      snapshot_freq=10 ** 9, save_model_freq=10 ** 9,
                      compute_dtype="bfloat16", distortion="msssim")
    ckdir = os.path.join(OUTDIR, f"rgb_msssim_{lam}_ck")
    start, params = 0, None
    latest = latest_checkpoint(ckdir)
    if latest is not None:
        start = step_from_path(latest)
        if start >= steps:
            print(f"[msssim λ={lam}] already trained to {start}", flush=True)
            return ckdir
        print(f"[msssim λ={lam}] resuming from {start}", flush=True)
    trainer = RGBTrainer(cfg, ckdir)
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
            print(f"[msssim λ={lam}] step {i}: rd={float(m['rd_loss']):.3f} "
                  f"bpp={float(m['bpp']):.4f}", flush=True)
        if (i + 1) % 800 == 0 and (i + 1) < steps:
            save_checkpoint(state.params, ckdir, i + 1)
    save_checkpoint(state.params, ckdir, steps)
    print(f"[msssim λ={lam}] {start}..{steps} in {time.time()-t0:.0f}s",
          flush=True)
    return ckdir


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    lam = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print(jax.devices(), flush=True)
    ck_msssim = train_msssim(lam, steps)

    import jax.numpy as jnp
    from rgba_tpu.eval.kodak import evaluate_kodak
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    from rgba_tpu.utils.init import cpu_init

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    m0 = np.zeros((1, 256, 256, 1), np.float32)
    x0 = np.zeros((1, 256, 256, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me0 = mask_pyramid(jnp.asarray(m0))
    mask_tmpl = cpu_init(mask_model, {"params": key, "noise": key}, m0,
                         training=False)["params"]
    rgb_tmpl = cpu_init(rgb_model, {"params": key, "noise": key}, x0, m0,
                        m0, me0, training=False)["params"]
    mask_params = load_checkpoint(
        jax.device_get(mask_tmpl),
        latest_checkpoint(os.path.join(OUTDIR, "mask_1024_ck")))

    tree = os.path.join(OUTDIR, "kodak")
    points = {}
    for name, ckdir in (("mse_4096", os.path.join(OUTDIR, "rgb_4096_ck")),
                        (f"msssim_{lam}", ck_msssim)):
        rgb_params = load_checkpoint(jax.device_get(rgb_tmpl),
                                     latest_checkpoint(ckdir))
        avg = evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                             tree, step=steps, real_codec=False)
        points[name] = {k: round(float(v), 6) for k, v in avg.items()}
        print(f"{name}: {json.dumps(points[name])}", flush=True)

    ms, mse = points[f"msssim_{lam}"], points["mse_4096"]
    # the core claim: normalized by rate, the msssim-trained model wins
    # on the metric it optimizes (1-msssim per bpp strictly lower)
    cost_ms = (1 - ms["msssim"]) * ms["bpp"]
    cost_mse = (1 - mse["msssim"]) * mse["bpp"]
    print(json.dumps({"msssim_deficit_x_bpp": {"msssim_trained": cost_ms,
                                               "mse_trained": cost_mse}}),
          flush=True)
    assert cost_ms < cost_mse, (cost_ms, cost_mse)
    print("msssim_proof OK", flush=True)


if __name__ == "__main__":
    main()
