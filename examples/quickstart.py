"""Quickstart: train both codecs a few steps on synthetic RGBA data, run
the joint eval, and produce a real compressed file — all self-contained.

    python examples/quickstart.py            # TPU if available, else CPU

This is a miniature of the full workflow; for real training use the CLI
drivers (python -m rgba_tpu.cli.train_mask / train_rgb) with the dataset
layout documented in README.md.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rgba_tpu.core.config import TrainConfig
from rgba_tpu.data.loader import BatchLoader
from rgba_tpu.data.synthetic import (synthetic_rgba_batch,
                                     write_synthetic_kodak_tree)
from rgba_tpu.parallel.mesh import shard_batch
from rgba_tpu.train.loops import MaskTrainer, RGBTrainer


class SynthDataset:
    def __init__(self, n=32, hw=64):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def get(self, idx, epoch_seed=0):
        b = synthetic_rgba_batch(1, self.hw, self.hw, seed=idx)
        return {k: v[0] for k, v in b.items()}


def main():
    print(f"devices: {jax.devices()}")
    cfg = TrainConfig(train_lambda=1024, batch_size=8, tot_step=20,
                      cal_step=1, print_freq=10, snapshot_freq=10**9,
                      save_model_freq=10**9)
    tmp = tempfile.mkdtemp(prefix="rgba_tpu_quickstart_")

    # 1. train the mask codec a few steps
    mask_tr = MaskTrainer(cfg, os.path.join(tmp, "mask"))
    loader = BatchLoader(SynthDataset(), batch_size=8, num_workers=2)
    example = next(iter(loader))
    state = mask_tr.init_state(example)
    step = mask_tr.compiled_step()
    rng = jax.random.PRNGKey(0)
    for i in range(cfg.tot_step):
        rng, sub = jax.random.split(rng)
        batch = {k: example[k] for k in mask_tr.batch_keys}
        state, metrics = step(state, shard_batch(mask_tr.mesh, batch), sub)
    print(f"mask codec: rd_loss after {cfg.tot_step} steps = "
          f"{float(metrics['rd_loss']):.2f}")
    mask_params = jax.device_get(state.params)

    # 2. train the RGB codec a few steps
    rgb_tr = RGBTrainer(cfg, os.path.join(tmp, "rgb"))
    state = rgb_tr.init_state(example)
    step = rgb_tr.compiled_step()
    for i in range(cfg.tot_step):
        rng, sub = jax.random.split(rng)
        batch = {k: example[k] for k in rgb_tr.batch_keys}
        state, metrics = step(state, shard_batch(rgb_tr.mesh, batch), sub)
    print(f"rgb codec: rd_loss after {cfg.tot_step} steps = "
          f"{float(metrics['rd_loss']):.2f}")
    rgb_params = jax.device_get(state.params)

    # 3. joint Kodak-style eval on a synthetic tree
    from rgba_tpu.eval.kodak import evaluate_kodak
    root = os.path.join(tmp, "kodak")
    write_synthetic_kodak_tree(root, n_images=1, height=192, width=256)
    import logging
    logging.getLogger("rgba_tpu").addHandler(logging.StreamHandler())
    logging.getLogger("rgba_tpu").setLevel(logging.INFO)
    avg = evaluate_kodak(rgb_tr.model, state.params, mask_tr.model,
                         mask_params, root,
                         output_dir=os.path.join(tmp, "out"))
    print(f"eval: bpp={avg['bpp']:.3f} psnr={avg['psnr']:.2f}")

    # 4. real bitstream round trip
    from rgba_tpu.native import rans
    if rans.available():
        from rgba_tpu.eval.codec_io import CodecIO
        from rgba_tpu.eval.container import RGBAFileCodec
        codec = RGBAFileCodec(CodecIO(rgb_tr.model, rgb_params, kind="rgb"),
                              CodecIO(mask_tr.model, mask_params, kind="mask"))
        d = synthetic_rgba_batch(1, 64, 64, seed=7)
        blob = codec.encode(d["image"], d["alpha"])
        rgba = codec.decode(blob)
        print(f"bitstream: {len(blob)} bytes -> decoded {rgba.shape}, "
              f"bpp={len(blob) * 8 / (64 * 64):.3f}")
    print(f"artifacts in {tmp}")


if __name__ == "__main__":
    main()
