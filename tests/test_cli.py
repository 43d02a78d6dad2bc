"""CLI smoke tests: the reference-compatible drivers run end to end on a
tiny synthetic dataset tree."""

import json
import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from rgba_tpu.data.synthetic import synthetic_rgba_batch

pytestmark = pytest.mark.slow


def _write_train_tree(root, n=8, hw=64):
    coco = os.path.join(root, "COCOdata")
    os.makedirs(coco, exist_ok=True)
    for i in range(n):
        b = synthetic_rgba_batch(1, hw, hw, seed=i)
        rgba = np.concatenate([b["image"][0], b["alpha"][0]], -1)
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            os.path.join(coco, f"img{i:03d}.png"))
    return coco


def test_train_mask_cli_smoke(monkeypatch):
    from rgba_tpu.cli import train_mask
    with tempfile.TemporaryDirectory() as root:
        coco = _write_train_tree(root)
        cfg = {
            "tot_epoch": 10, "tot_step": 3, "train_lambda": 256,
            "batch_size": 2, "print_freq": 1, "save_model_freq": 10 ** 9,
            "lr": {"base": 1e-4, "decay": 0.1, "decay_interval": 1000},
        }
        cfg_path = os.path.join(root, "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        monkeypatch.chdir(root)
        train_mask.main(["--config", cfg_path, "-n", "smoke",
                         "--train-coco", coco, "--train-p3m", "",
                         "--kodak", os.path.join(root, "nokodak")])
        # final checkpoint written at tot_step
        ckpts = os.listdir(os.path.join(root, "checkpoints", "smoke"))
        assert any(c.startswith("iter_3") for c in ckpts), ckpts


def test_codec_cli_roundtrip(tmp_path):
    from rgba_tpu.cli import codec
    from rgba_tpu.native import rans
    if not rans.available():
        pytest.skip("native rans not built")
    b = synthetic_rgba_batch(1, 64, 64, seed=5)
    rgba = np.concatenate([b["image"][0], b["alpha"][0]], -1)
    src = tmp_path / "in.png"
    Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(src)
    blob = tmp_path / "out.rgbc"
    recon = tmp_path / "recon.png"
    codec.main(["encode", str(src), str(blob)])
    assert blob.stat().st_size > 16
    codec.main(["decode", str(blob), str(recon)])
    img = Image.open(recon)
    assert img.mode == "RGBA" and img.size == (64, 64)
