"""RGB-codec training/eval driver (trainRGB.py equivalent).

Train:  python -m rgba_tpu.cli.train_rgb --config cfgRGB.json -n run1 \
            -pm checkpoints/mask/iter_600000.ckpt
Eval:   ... -p checkpoints/run1/iter_1500000.ckpt --test --kodak ../Kodak/
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..core.config import load_config
from ..data.datasets import RGBATrainDataset
from ..data.loader import BatchLoader
from ..eval.kodak import evaluate_kodak
from ..models.mask_codec import MaskCodec
from ..models.rgb_codec import RGBCodec
from ..train.loops import RGBTrainer
from .common import build_parser, load_params_if, make_tb_writer, setup_logging


def _init_mask_params(mask_model):
    import numpy as np

    from ..utils.init import cpu_init
    mask = np.zeros((1, 64, 64, 1), np.float32)
    rng = jax.random.PRNGKey(0)
    # host-CPU template init (utils/init.py) — avoids the per-primitive
    # remote-compile stall of eager on-device init
    return cpu_init(mask_model, {"params": rng, "noise": rng}, mask,
                    training=False)["params"]


def main(argv=None):
    args = build_parser("TPU RGB codec trainer").parse_args(argv)
    cfg = load_config(args.config if args.config else None,
                      parity=args.parity, seed=args.seed)

    save_path = os.path.join("checkpoints", args.name) if args.name else ""
    logger = setup_logging(save_path)
    logger.info("RGB codec training (TPU)")

    model = RGBCodec()
    mask_model = MaskCodec()
    mask_params = _init_mask_params(mask_model)
    if args.pretrainmask:
        mask_params, _ = load_params_if(args.pretrainmask,
                                        jax.device_get(mask_params))

    trainer = RGBTrainer(cfg, save_path or "checkpoints/_unnamed", model=model)

    if args.test:
        example = {
            "masked_image": np.zeros((1, 64, 64, 3), np.float32),
            "alpha": np.zeros((1, 64, 64, 1), np.float32),
            "image": np.zeros((1, 64, 64, 3), np.float32),
        }
        state = trainer.init_state(example)
        params, step = load_params_if(args.pretrain,
                                      jax.device_get(state.params))
        # reference eval-time curriculum (trainRGB.py:277-296): while the
        # checkpoint step is inside the full-image phase, eval unmasked
        # against an all-ones mask (the real-codec path has no such branch)
        cur = step < cfg.curriculum_step and not args.real_codec
        evaluate_kodak(model, params, mask_model, mask_params, args.kodak,
                       output_dir="outputKodak", step=step,
                       real_codec=args.real_codec, curriculum=cur)
        return

    ds = RGBATrainDataset(args.train_coco, args.train_p3m,
                          height=cfg.image_size, width=cfg.image_size,
                          fill_mix_ratio=cfg.fill_mix_ratio, seed=cfg.seed)
    if len(ds) == 0:
        logger.error("no training images under %s / %s", args.train_coco,
                     args.train_p3m)
        sys.exit(1)
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
        evaluate_kodak(model, st.params, mask_model, mask_params,
                       args.kodak, output_dir="outputKodak", step=step,
                       tb_writer=tb, curriculum=step < cfg.curriculum_step)

    eval_hook = eval_fn if os.path.isdir(
        os.path.join(args.kodak, "PNGImages")) else None
    try:
        trainer.train(loader, state, tb_writer=tb, eval_fn=eval_hook)
    finally:
        if tb is not None:
            tb.close()


if __name__ == "__main__":
    main()
