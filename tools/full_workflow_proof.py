"""Full user-workflow proof on the real TPU: train -> checkpoint ->
reload -> real-bitstream Kodak eval with the TRAINED weights.

Random-weight evals exercise the machinery but have degenerate entropy
tables; this run pins that trained priors produce sane real-codec
numbers end-to-end: both codecs trained on-chip, checkpoints written and
reloaded through the standard path, then evaluate_kodak(real_codec=True)
on a synthetic Kodak-sized tree — byte-accurate bpp near the likelihood
estimate and |decode - forward| at 8-bit scale.

Usage: python -u tools/full_workflow_proof.py [steps] (default 1200)
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
from rgba_tpu.train.checkpoint import (latest_checkpoint, load_checkpoint,
                                       save_checkpoint)
from rgba_tpu.train.loops import MaskTrainer, RGBTrainer
from tools.train_proof import SynthDataset


def train_one(kind, steps, outdir):
    cfg = TrainConfig(train_lambda=1024, batch_size=16, cal_step=1,
                      tot_step=steps, aux_lr=1e-3, curriculum_step=0,
                      snapshot_freq=10 ** 9, save_model_freq=10 ** 9,
                      compute_dtype="bfloat16")
    cls = MaskTrainer if kind == "mask" else RGBTrainer
    ckdir = os.path.join(outdir, f"{kind}_ck")
    trainer = cls(cfg, ckdir)
    loader = BatchLoader(SynthDataset(n=256, hw=256),
                         batch_size=cfg.batch_size, num_workers=4, seed=0)
    it = iter(loader)
    example = next(it)
    state = trainer.init_state(example)
    step_fn = trainer.compiled_step()
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    last = None
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
        last = metrics
        if (i + 1) % 200 == 0:
            m = jax.device_get(last)
            print(f"[{kind}] step {i}: rd={float(m['rd_loss']):.3f} "
                  f"bpp={float(m['bpp']):.4f}", flush=True)
    save_checkpoint(state.params, ckdir, steps)
    print(f"[{kind}] trained {steps} steps in {time.time() - t0:.0f}s; "
          f"checkpoint at {latest_checkpoint(ckdir)}", flush=True)
    return ckdir


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    outdir = "/tmp/full_workflow"
    os.makedirs(outdir, exist_ok=True)
    print(jax.devices(), flush=True)

    mask_ck = train_one("mask", steps, outdir)
    rgb_ck = train_one("rgb", steps, outdir)

    # reload through the standard checkpoint path (fresh param templates)
    import jax.numpy as jnp
    from rgba_tpu.ops.mask_pyramid import mask_pyramid

    from rgba_tpu.utils.init import cpu_init

    key = jax.random.PRNGKey(0)
    mask_model, rgb_model = MaskCodec(), RGBCodec()
    m0 = np.zeros((1, 256, 256, 1), np.float32)
    x0 = np.zeros((1, 256, 256, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        me = mask_pyramid(jnp.asarray(m0))
    mask_tmpl = cpu_init(mask_model, {"params": key, "noise": key}, m0,
                         training=False)["params"]
    rgb_tmpl = cpu_init(rgb_model, {"params": key, "noise": key}, x0, m0,
                        m0, me, training=False)["params"]
    mask_params = load_checkpoint(jax.device_get(mask_tmpl),
                                  latest_checkpoint(mask_ck))
    rgb_params = load_checkpoint(jax.device_get(rgb_tmpl),
                                 latest_checkpoint(rgb_ck))

    # real-bitstream eval on a synthetic Kodak-sized tree
    from rgba_tpu.data.synthetic import write_synthetic_kodak_tree
    from rgba_tpu.eval.kodak import evaluate_kodak

    tree = os.path.join(outdir, "kodak")
    write_synthetic_kodak_tree(tree, n_images=3, height=512, width=768)
    t0 = time.time()
    avg = evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                         tree, step=steps, real_codec=True)
    print(json.dumps({k: round(float(v), 6) for k, v in avg.items()}),
          flush=True)
    assert np.isfinite(avg["real_bpp"]) and avg["real_bpp"] > 0
    # decode-vs-forward oracle: on TPU the codec's differently-fused fp32
    # programs can round a mask pixel across an 8-bit boundary relative to
    # the eval pipeline's forward, so allow up to ~1.5 quantization levels
    # (1/255 = 3.9e-3); measured 2.6e-3 at trained weights. The CPU CI
    # test (identical program order both sides) pins the tight 1e-3.
    assert avg["codec_err"] < 6e-3, avg["codec_err"]
    assert 0.5 * avg["bpp"] < avg["real_bpp"] < 1.5 * avg["bpp"] + 0.1
    print(f"eval {time.time() - t0:.0f}s — full_workflow_proof OK",
          flush=True)


if __name__ == "__main__":
    main()
