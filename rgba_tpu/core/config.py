"""Typed training configuration.

One dataclass replaces the reference's module-level globals mutated by
``parse_config`` (reference trainRGB.py:113-138, trainmask.py:93-118).  The
JSON schema is identical to the shipped configs under
reference examples/example/config*.json: keys ``tot_epoch, tot_step,
train_lambda, batch_size, print_freq, save_model_freq, cal_step`` and the
nested ``lr.{base, decay, decay_interval, decay_interval2}``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # --- reference JSON keys (defaults = reference module globals) ---
    tot_epoch: int = 1_000_000          # trainRGB.py:41
    tot_step: int = 2_500_000           # trainRGB.py:42
    train_lambda: float = 8192          # trainRGB.py:36
    batch_size: int = 4                 # trainRGB.py:40
    print_freq: int = 100               # trainRGB.py:37
    cal_step: int = 40                  # trainRGB.py:38
    save_model_freq: int = 50_000       # trainRGB.py:49
    base_lr: float = 1e-4               # trainRGB.py:35 (lr.base)
    lr_decay: float = 0.1               # trainRGB.py:44 (lr.decay)
    decay_interval: int = 2_200_000     # trainRGB.py:43 (lr.decay_interval)
    # second decay stage used by the mask driver only (trainmask.py:39-41):
    # lr -> base*decay at decay_interval, -> base*decay2 at decay_interval2.
    decay_interval2: Optional[int] = None
    lr_decay2: float = 0.01             # trainmask.py:341 (x0.01 hardcoded)
    warmup_step: int = 0                # trainRGB.py:39
    image_size: int = 256               # trainRGB.py:45

    # --- engineering knobs new to the TPU build (not in reference JSON) ---
    seed: int = 234                     # trainRGB.py:66 argparse default
    grad_clip: float = 5.0              # value clip +-5, trainRGB.py:190-195
    aux_lr: float = 1e-3                # aux optimizer for bottleneck quantiles
                                        # (reference leaves quantiles untrained;
                                        # set 0.0 for strict parity)
    curriculum_step: int = 500_000      # full-image/all-ones-mask phase,
                                        # trainRGB.py:172-174
    fill_mix_ratio: float = 0.25        # trainRGB.py:387
    compute_dtype: str = "bfloat16"     # bf16 activations on TPU
    num_devices: int = 0                # 0 = use all local devices (DP)
    snapshot_freq: int = 5000           # rotating ckpt cadence, trainRGB.py:240
    # RGB-codec distortion term: "mse" (reference default) or "msssim"
    # (1 - masked MS-SSIM, the commented-out alternative at trainRGB.py:183;
    # BASELINE.json lists "training with masked MS-SSIM loss" as a config).
    distortion: str = "mse"

    def lr_at(self, step: int) -> float:
        """Piecewise-constant schedule, trainRGB.py:142-155 / trainmask.py:337-341."""
        if self.warmup_step > 0 and step < self.warmup_step:
            return self.base_lr * step / self.warmup_step
        if self.decay_interval2 is not None and step >= self.decay_interval2:
            return self.base_lr * self.lr_decay2
        if step >= self.decay_interval:
            return self.base_lr * self.lr_decay
        return self.base_lr


def load_config(path: Optional[str] = None, parity: bool = False,
                **overrides) -> TrainConfig:
    """Load a reference-format JSON config into a TrainConfig.

    parity=True applies the strict-reference-parity preset in one flag:
    fp32 compute (which also selects the exact-erf GELU and keeps every
    fused/packed kernel off — core/precision.py DEFAULT_POLICY) and
    ``aux_lr=0`` (the reference never trains the bottleneck quantiles —
    no aux optimizer anywhere in trainRGB.py:142-198).  Explicit
    ``**overrides`` still win over the preset.
    """
    cfg = TrainConfig()
    if path:
        with open(path) as f:
            raw = json.load(f)
        for key in ("tot_epoch", "tot_step", "train_lambda", "batch_size",
                    "print_freq", "save_model_freq", "cal_step"):
            if key in raw:
                setattr(cfg, key, raw[key])
        lr = raw.get("lr", {})
        if "base" in lr:
            cfg.base_lr = lr["base"]
        if "decay" in lr:
            cfg.lr_decay = lr["decay"]
        if "decay_interval" in lr:
            cfg.decay_interval = lr["decay_interval"]
        if "decay_interval2" in lr:
            cfg.decay_interval2 = lr["decay_interval2"]
        # accept engineering keys too, if present
        for key in ("seed", "grad_clip", "aux_lr", "curriculum_step",
                    "fill_mix_ratio", "compute_dtype", "num_devices",
                    "distortion"):
            if key in raw:
                setattr(cfg, key, raw[key])
    if parity:
        # after the JSON (the flag means parity even with a config file),
        # before overrides (explicit kwargs still win)
        cfg.compute_dtype = "float32"
        cfg.aux_lr = 0.0
    for k, v in overrides.items():
        if not hasattr(cfg, k):
            raise KeyError(f"unknown config key: {k}")
        setattr(cfg, k, v)
    return cfg
