"""Synthetic RGBA data for tests and benchmarks (no external datasets).

Generates smooth random images with blob-shaped alpha mattes, deterministic
per seed; can also materialize a fake Kodak eval tree with the exact
directory layout the reference README documents (README.md:10-16).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _smooth_noise(rng, h, w, c, octaves=3):
    img = np.zeros((h, w, c), np.float32)
    for o in range(octaves):
        sh, sw = max(2, h >> (octaves - o + 1)), max(2, w >> (octaves - o + 1))
        base = rng.rand(sh, sw, c).astype(np.float32)
        img += np.asarray(
            Image.fromarray((base * 255).astype(np.uint8).squeeze()
                            if c == 1 else (base * 255).astype(np.uint8)
                            ).resize((w, h), Image.BILINEAR),
            np.float32).reshape(h, w, c) / 255.0 * (0.5 ** o)
    img /= img.max() + 1e-6
    return np.clip(img, 0, 1)


def _blob_alpha(rng, h, w, n_blobs=3):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    alpha = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        ry, rx = rng.uniform(0.1, 0.35) * h, rng.uniform(0.1, 0.35) * w
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        alpha = np.maximum(alpha, np.clip(1.5 - d, 0, 1))
    return np.clip(alpha, 0, 1)[..., None]


def synthetic_rgba_batch(batch: int, height: int, width: int, seed: int = 0,
                         opaque: bool = False):
    """Returns dict(masked_image, alpha, image, rgba) of NHWC float32."""
    rng = np.random.RandomState(seed)
    imgs, alphas = [], []
    for _ in range(batch):
        img = _smooth_noise(rng, height, width, 3)
        alpha = (np.ones((height, width, 1), np.float32) if opaque
                 else np.round(_blob_alpha(rng, height, width) * 255) / 255)
        imgs.append(img)
        alphas.append(alpha)
    image = np.stack(imgs)
    alpha = np.stack(alphas)
    masked = np.where(alpha > 0, image, alpha)
    return {
        "masked_image": masked.astype(np.float32),
        "alpha": alpha.astype(np.float32),
        "image": image.astype(np.float32),
        "rgba": np.concatenate([image, alpha], -1).astype(np.float32),
    }


def write_synthetic_kodak_tree(root: str, n_images: int = 2,
                               height: int = 512, width: int = 768,
                               seed: int = 0):
    """Materialize <root>/{PNGImages,MaskImages,ImageSets} like the real
    Kodak RGBA layout so the eval path can be driven without the dataset."""
    os.makedirs(os.path.join(root, "PNGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "MaskImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    ids = []
    for i in range(n_images):
        batch = synthetic_rgba_batch(1, height, width, seed=seed + i)
        img = (batch["image"][0] * 255).astype(np.uint8)
        alpha = (batch["alpha"][0, ..., 0] * 255).astype(np.uint8)
        name = f"synth{i:02d}"
        Image.fromarray(img).save(os.path.join(root, "PNGImages", name + ".png"))
        Image.fromarray(alpha, "L").save(
            os.path.join(root, "MaskImages", name + ".png"))
        ids.append(name)
    with open(os.path.join(root, "ImageSets", "mask.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids
