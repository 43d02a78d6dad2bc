"""RGBA datasets (host side, torch-free).

Mirrors my_datasets/MYdataset.py:
  * RGBATrainDataset == COCOP3MDataset (:55-115): globs RGBA PNGs from a
    COCO-composited dir + P3M mask-patch dir, RandomResizedCrop to HxW,
    joint random h/v flip, and with probability ``fill_mix_ratio`` replaces
    the alpha with all-ones (FillImage, :102-111,117-119).
  * KodakDataset (:191-245): reads PNGImages/<id>.png + MaskImages/<id>.png
    listed in ImageSets/mask.txt (README.md:10-16 layout); the annotation is
    converted L->RGB and the masked image keeps RGB only where alpha > 0.

Every item is the reference 5-tuple (masked_image, alpha, img, alpha, rgba)
(:115) — returned here as a dict with NHWC float32 arrays in [0, 1].
"""

from __future__ import annotations

import glob
import math
import os
import random
from typing import List, Optional

import numpy as np
from PIL import Image, ImageFile

ImageFile.LOAD_TRUNCATED_IMAGES = True  # MYdataset.py:70


def _random_resized_crop_params(h: int, w: int, rng: random.Random,
                                scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop sampling: 10 tries, then center fallback."""
    area = h * w
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = rng.randint(0, h - ch)
            j = rng.randint(0, w - cw)
            return i, j, ch, cw
    # fallback: center crop with clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw = w
        ch = int(round(cw / ratio[0]))
    elif in_ratio > ratio[1]:
        ch = h
        cw = int(round(ch * ratio[1]))
    else:
        cw, ch = w, h
    i = (h - ch) // 2
    j = (w - cw) // 2
    return i, j, ch, cw


def _load_rgba(path: str) -> np.ndarray:
    img = Image.open(path)
    arr = np.array(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3 + [np.full_like(arr, 255)], axis=-1)
    elif arr.shape[-1] == 3:
        arr = np.concatenate(
            [arr, np.full(arr.shape[:2] + (1,), 255, arr.dtype)], axis=-1)
    return arr  # (H, W, 4) uint8


def _to_item(img: np.ndarray, alpha: np.ndarray) -> dict:
    """img: (H,W,3) float32 [0,1]; alpha: (H,W,1)."""
    masked = np.where(alpha > 0, img, alpha)   # MYdataset.py:113
    return {
        "masked_image": masked.astype(np.float32),
        "alpha": alpha.astype(np.float32),
        "image": img.astype(np.float32),
        "rgba": np.concatenate([img, alpha], axis=-1).astype(np.float32),
    }


class RGBATrainDataset:
    def __init__(self, coco_path: str = "../P3Mdata/COCOdata",
                 p3m_path: Optional[str] = "../P3Mdata/MASKpatches",
                 height: int = 256, width: int = 256,
                 fill_mix_ratio: float = 0.25, seed: int = 0):
        self.images: List[str] = sorted(
            glob.glob(os.path.join(coco_path, "*.png")))
        if p3m_path:
            self.images += sorted(glob.glob(os.path.join(p3m_path, "*.png")))
        self.height = height
        self.width = width
        self.fill_mix_ratio = fill_mix_ratio
        self.seed = seed

    def __len__(self):
        return len(self.images)

    def get(self, index: int, epoch_seed: int = 0) -> dict:
        rng = random.Random(f"{self.seed}:{epoch_seed}:{index}")
        arr = _load_rgba(self.images[index])
        h, w = arr.shape[:2]
        i, j, ch, cw = _random_resized_crop_params(h, w, rng)
        crop = arr[i:i + ch, j:j + cw]
        pil = Image.fromarray(crop, "RGBA").resize(
            (self.width, self.height), Image.BILINEAR)
        out = np.asarray(pil, dtype=np.float32) / 255.0
        if rng.random() < 0.5:
            out = out[:, ::-1]
        if rng.random() < 0.5:
            out = out[::-1, :]
        img = np.ascontiguousarray(out[..., :3])
        alpha = np.ascontiguousarray(out[..., 3:4])
        if rng.random() < self.fill_mix_ratio:
            alpha = np.ones_like(alpha)
        return _to_item(img, alpha)


class KodakDataset:
    """Eval tree: <root>/PNGImages/<id>.<ext>, <root>/MaskImages/<id>.png,
    ids from <root>/ImageSets/mask.txt (make_datapath_list_for_Kodak,
    MYdataset.py:12-31).  img_ext="jpg" gives the P3M-500 eval layout
    (make_datapath_list_for_P3Meval, MYdataset.py:33-52)."""

    def __init__(self, rootpath: str, img_ext: str = "png"):
        ids = []
        with open(os.path.join(rootpath, "ImageSets", "mask.txt")) as f:
            for line in f:
                line = line.strip()
                if line:
                    ids.append(line)
        self.img_paths = [os.path.join(rootpath, "PNGImages", f"{i}.{img_ext}")
                          for i in ids]
        self.anno_paths = [os.path.join(rootpath, "MaskImages", f"{i}.png")
                           for i in ids]

    def __len__(self):
        return len(self.img_paths)

    def get(self, index: int) -> dict:
        img = np.asarray(Image.open(self.img_paths[index]).convert("RGB"),
                         dtype=np.float32) / 255.0
        anno = np.asarray(Image.open(self.anno_paths[index]).convert("L"),
                          dtype=np.float32) / 255.0
        alpha = anno[..., None]
        return _to_item(img, alpha)
