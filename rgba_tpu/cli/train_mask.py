"""Mask-codec training/eval driver (trainmask.py equivalent).

Train:  python -m rgba_tpu.cli.train_mask --config cfg.json -n run1
Eval:   python -m rgba_tpu.cli.train_mask --config cfg.json -n run1 \
            -p checkpoints/run1/iter_600000.ckpt --test --kodak ../Kodak/
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..core.config import load_config
from ..data.datasets import RGBATrainDataset, KodakDataset
from ..data.loader import BatchLoader
from ..models.mask_codec import MaskCodec
from ..train.loops import MaskTrainer
from .common import build_parser, load_params_if, make_tb_writer, setup_logging


def evaluate_mask(model, params, rootpath, logger, step=0, tb=None,
                  output_dir=""):
    """Mask-only Kodak eval (trainmask.py:242-293): bpp estimated from
    likelihoods; recon rounded with round(x*255, decimals=1).clamp/255
    (:260-261), neighbor-sum constraint (:262), PSNR + MS-SSIM on the
    1-channel mask (:264-277)."""
    import jax.numpy as jnp
    from ..metrics.ms_ssim import ms_ssim
    from ..ops.morphology import constraint_mask

    ds = KodakDataset(rootpath)

    @jax.jit
    def eval_step(p, mask):
        out = model.apply({"params": p}, mask, training=False)
        recon = jnp.clip(jnp.round(out["x_hat"] * 255.0, decimals=1),
                         0.0, 255.0) / 255.0
        recon = constraint_mask(recon)
        mse = jnp.mean(jnp.square(recon - mask))
        msssim = ms_ssim(mask, recon, data_range=1.0)
        return {"bpp": out["bpp"], "mse": mse, "msssim": msssim,
                "recon": recon}

    sums = {"bpp": 0.0, "psnr": 0.0, "msssim": 0.0, "msssimdb": 0.0}
    for i in range(len(ds)):
        item = ds.get(i)
        mask = jnp.asarray(item["alpha"][None])
        out = jax.device_get(eval_step(params, mask))
        psnr = 10 * np.log10(1.0 / max(float(out["mse"]), 1e-12))
        msssim = float(out["msssim"])
        msssimdb = -10 * np.log10(max(1 - msssim, 1e-12))
        sums["bpp"] += float(out["bpp"])
        sums["psnr"] += psnr
        sums["msssim"] += msssim
        sums["msssimdb"] += msssimdb
        logger.info("Num:%d, Bpp:%.6f, PSNR:%.6f, MS-SSIM:%.6f, "
                    "MS-SSIM-DB:%.6f", i + 1, float(out["bpp"]), psnr,
                    msssim, msssimdb)
        if output_dir:
            from PIL import Image
            os.makedirs(output_dir, exist_ok=True)
            arr = (np.clip(out["recon"][0, ..., 0], 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(
                os.path.join(output_dir, f"{i + 1}mask.png"))
    n = max(len(ds), 1)
    avg = {k: v / n for k, v in sums.items()}
    logger.info("Dataset Average result---Bpp:%.6f, PSNR:%.6f, "
                "MS-SSIM:%.6f, MS-SSIM-DB:%.6f", avg["bpp"], avg["psnr"],
                avg["msssim"], avg["msssimdb"])
    if tb is not None:
        tb.add_scalar("BPP_Test", avg["bpp"], step)
        tb.add_scalar("PSNR_Test", avg["psnr"], step)
        tb.add_scalar("MS-SSIM_Test", avg["msssim"], step)
        tb.add_scalar("MS-SSIM_DB_Test", avg["msssimdb"], step)
    return avg


def main(argv=None):
    args = build_parser("TPU mask codec trainer").parse_args(argv)
    cfg = load_config(args.config if args.config else None,
                      parity=args.parity, seed=args.seed)
    # mask driver defaults (trainmask.py:30-41)
    if args.config is None:
        cfg.tot_step = 600_000
        cfg.decay_interval = 220_000
    if cfg.decay_interval2 is None:
        cfg.decay_interval2 = 500_000   # hardcoded in trainmask.py:39
    cfg.fill_mix_ratio = 0.0            # trainmask.py:333
    cfg.snapshot_freq = 2000            # rotating cadence, trainmask.py:65-76

    save_path = os.path.join("checkpoints", args.name) if args.name else ""
    logger = setup_logging(save_path)
    logger.info("mask codec training (TPU)")

    model = MaskCodec()
    trainer = MaskTrainer(cfg, save_path or "checkpoints/_unnamed",
                          model=model)

    ds = RGBATrainDataset(args.train_coco, args.train_p3m,
                          height=cfg.image_size, width=cfg.image_size,
                          fill_mix_ratio=cfg.fill_mix_ratio, seed=cfg.seed)
    if len(ds) == 0 and not args.test:
        logger.error("no training images under %s / %s", args.train_coco,
                     args.train_p3m)
        sys.exit(1)

    if args.test:
        import jax.numpy as jnp
        example = {"alpha": np.zeros((1, 64, 64, 1), np.float32)}
        state = trainer.init_state(example)
        params, _ = load_params_if(args.pretrain, jax.device_get(state.params))
        evaluate_mask(model, params, args.kodak, logger)
        return

    loader = BatchLoader(ds, batch_size=cfg.batch_size, shuffle=True,
                         num_workers=4, seed=cfg.seed)
    example = next(iter(loader))
    state = trainer.init_state(example)
    if args.pretrain:
        params, step = load_params_if(args.pretrain,
                                      jax.device_get(state.params))
        state = trainer.init_state(example, params=params, step=step)
    tb = make_tb_writer(save_path) if save_path else None

    def eval_fn(step, st):
        evaluate_mask(model, st.params, args.kodak, logger, step, tb)

    eval_hook = eval_fn if os.path.isdir(os.path.join(args.kodak, "PNGImages")) else None
    try:
        trainer.train(loader, state, tb_writer=tb, eval_fn=eval_hook)
    finally:
        if tb is not None:
            tb.close()


if __name__ == "__main__":
    main()
