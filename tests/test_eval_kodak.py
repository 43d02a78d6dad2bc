"""End-to-end eval on a synthetic Kodak-layout tree (SURVEY §4: the
reference's only integration test is testKodak; this is its automated
equivalent on a fake 2-image dataset)."""

import logging
import os
import tempfile

import jax
import numpy as np
import pytest

from rgba_tpu.data.synthetic import write_synthetic_kodak_tree
from rgba_tpu.data.datasets import KodakDataset

pytestmark = pytest.mark.slow


def test_synthetic_tree_layout():
    with tempfile.TemporaryDirectory() as root:
        ids = write_synthetic_kodak_tree(root, n_images=2, height=128,
                                         width=192)
        assert len(ids) == 2
        ds = KodakDataset(root)
        assert len(ds) == 2
        item = ds.get(0)
        assert item["image"].shape == (128, 192, 3)
        assert item["alpha"].shape == (128, 192, 1)
        assert item["masked_image"].shape == (128, 192, 3)
        # masked image zero where alpha == 0
        dead = item["alpha"][..., 0] == 0
        assert (item["masked_image"][dead] == 0).all()


def test_evaluate_kodak_real_codec():
    """evaluate_kodak(real_codec=True) runs the actual rANS bitstream per
    image: the container must decode to the forward-quantized recon and
    the byte-accurate bpp must sit near the likelihood estimate
    (VERDICT r1 item 5; reference analog trainRGB.py:258-334 which can
    only estimate)."""
    from rgba_tpu.eval.kodak import evaluate_kodak
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.native import rans
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    import jax.numpy as jnp

    if not rans.available():
        pytest.skip("native rans not built")

    key = jax.random.PRNGKey(0)
    with tempfile.TemporaryDirectory() as root:
        write_synthetic_kodak_tree(root, n_images=1, height=192, width=256)

        mask_model = MaskCodec()
        mask = jnp.zeros((1, 192, 256, 1))
        mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                      training=False)["params"]
        rgb_model = RGBCodec()
        x = jnp.zeros((1, 192, 256, 3))
        me = mask_pyramid(mask)
        rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                    mask, me, training=False)["params"]

        avg = evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                             root, step=0, real_codec=True)
        assert np.isfinite(avg["real_bpp"]) and avg["real_bpp"] > 0
        # decoded bitstream == forward-quantized recon (8-bit scale: one
        # quantization level is 1/255 ~ 4e-3)
        assert avg["codec_err"] < 1e-3
        # byte-accurate bpp close to the likelihood estimate: the container
        # gates with the recon mask while the estimate uses the GT mask, so
        # allow slack plus the rANS tail overhead on a tiny image
        est = avg["bpp"]
        assert 0.5 * est < avg["real_bpp"] < 1.5 * est + 0.1
        assert avg["codec_time"] > 0


def test_evaluate_kodak_curriculum_branch():
    """Reference eval-time curriculum (trainRGB.py:277-296): while
    global_step < 500k, eval uses the full UNMASKED image with an
    all-ones mask and writes an RGB (not RGBA) PNG.  Pinned by equality:
    curriculum=True on a transparent tree must give identical metrics to
    curriculum=False on the same images with the alpha overwritten to
    fully opaque (then the two input pipelines coincide exactly)."""
    import shutil
    from PIL import Image
    from rgba_tpu.eval.kodak import evaluate_kodak
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    with tempfile.TemporaryDirectory() as root:
        tree = os.path.join(root, "tree")
        write_synthetic_kodak_tree(tree, n_images=1, height=192, width=256)
        opaque = os.path.join(root, "opaque")
        shutil.copytree(tree, opaque)
        for f in os.listdir(os.path.join(opaque, "MaskImages")):
            p = os.path.join(opaque, "MaskImages", f)
            Image.new("L", Image.open(p).size, 255).save(p)

        mask_model = MaskCodec()
        mask = jnp.zeros((1, 192, 256, 1))
        mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                      training=False)["params"]
        rgb_model = RGBCodec()
        x = jnp.zeros((1, 192, 256, 3))
        me = mask_pyramid(mask)
        rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                    mask, me, training=False)["params"]

        out_dir = os.path.join(root, "out")
        a = evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                           tree, output_dir=out_dir, step=0,
                           curriculum=True)
        b = evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                           opaque, step=0, curriculum=False)
        for k in ("bpp", "psnr", "msssim", "msssimdb"):
            assert a[k] == pytest.approx(b[k], abs=1e-9), k
        # opaque rule: mask bpp excluded (bpp == rgb-only bpp) is implied
        # by the equality above; the saved PNG must be RGB, no alpha
        img = Image.open(os.path.join(out_dir, "1img.png"))
        assert img.mode == "RGB"
        with pytest.raises(ValueError):
            evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                           tree, step=0, curriculum=True, real_codec=True)


def test_evaluate_kodak_end_to_end():
    from rgba_tpu.eval.kodak import evaluate_kodak
    from rgba_tpu.models.mask_codec import MaskCodec
    from rgba_tpu.models.rgb_codec import RGBCodec
    from rgba_tpu.ops.mask_pyramid import mask_pyramid
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    with tempfile.TemporaryDirectory() as root:
        # > (win-1)*16 = 160 on the short side for MS-SSIM's 5 levels
        write_synthetic_kodak_tree(root, n_images=1, height=192, width=256)

        mask_model = MaskCodec()
        mask = jnp.zeros((1, 192, 256, 1))
        mask_params = mask_model.init({"params": key, "noise": key}, mask,
                                      training=False)["params"]
        rgb_model = RGBCodec()
        x = jnp.zeros((1, 192, 256, 3))
        me = mask_pyramid(mask)
        rgb_params = rgb_model.init({"params": key, "noise": key}, x, mask,
                                    mask, me, training=False)["params"]

        out_dir = os.path.join(root, "out")
        avg = evaluate_kodak(rgb_model, rgb_params, mask_model, mask_params,
                             root, output_dir=out_dir, step=0)
        assert np.isfinite(avg["bpp"]) and avg["bpp"] > 0
        assert np.isfinite(avg["psnr"])
        assert 0 <= avg["msssim"] <= 1
        # RGBA reconstruction written
        assert os.path.exists(os.path.join(out_dir, "1img.png"))
        from PIL import Image
        img = Image.open(os.path.join(out_dir, "1img.png"))
        assert img.mode == "RGBA" and img.size == (256, 192)
