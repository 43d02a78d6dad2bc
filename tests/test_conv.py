"""Numeric equivalence of NHWC conv primitives with torch geometry.

These tests pin down the exact conversion rules the .pth.tar importer relies
on: torch Conv2d weight (O,I,kh,kw) -> HWIO; torch ConvTranspose2d weight
(I,O,kh,kw) -> HWIO (+ the module flips spatial dims internally).
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from rgba_tpu.ops.conv import Conv, ConvTranspose, pixel_shuffle


def _rand(*shape):
    return np.random.RandomState(0).randn(*shape).astype(np.float32)


def test_conv_matches_torch():
    x = _rand(2, 3, 16, 16)          # NCHW for torch
    w = _rand(8, 3, 5, 5)            # OIHW
    b = _rand(8)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=2, padding=2).numpy()

    m = Conv(features=8, kernel_size=5, stride=2)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b)}}
    out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_conv_transpose_matches_torch():
    # deconv(k=5, s=2, p=2, output_padding=1) — AutoEncoderRGB_Journal.py:75-83
    x = _rand(2, 4, 8, 8)
    w = _rand(4, 6, 5, 5)            # torch ConvTranspose weight: (I, O, kh, kw)
    b = _rand(6)
    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                             stride=2, padding=2, output_padding=1).numpy()

    m = ConvTranspose(features=6, kernel_size=5, stride=2)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),
                         "bias": jnp.asarray(b)}}
    out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert out.shape == (2, 16, 16, 6)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_conv_transpose_1x1_stride1():
    # mask decoder's ConvTranspose2d(M,N,1,stride=1) — AutoEncoderMask_Journal.py:167
    x = _rand(1, 5, 4, 4)
    w = _rand(5, 7, 1, 1)
    b = _rand(7)
    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(w),
                             torch.tensor(b), stride=1, padding=0).numpy()
    m = ConvTranspose(features=7, kernel_size=1, stride=1, padding=0,
                      output_padding=0)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),
                         "bias": jnp.asarray(b)}}
    out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_pixel_shuffle_matches_torch():
    x = _rand(2, 12, 4, 4)           # C = 3 * 2 * 2
    ref = F.pixel_shuffle(torch.tensor(x), 2).numpy()
    out = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


def test_conv_transpose_subpixel_path_matches_torch():
    x = _rand(2, 4, 8, 8)
    w = np.random.RandomState(7).randn(4, 6, 5, 5).astype(np.float32)
    b = _rand(6)
    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                             stride=2, padding=2, output_padding=1).numpy()
    m = ConvTranspose(features=6, kernel_size=5, stride=2, use_subpixel=True)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),
                         "bias": jnp.asarray(b)}}
    out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_conv_space_to_depth_path_matches_torch():
    x = _rand(2, 3, 16, 16)
    w = np.random.RandomState(8).randn(8, 3, 5, 5).astype(np.float32)
    b = _rand(8)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=2, padding=2).numpy()
    m = Conv(features=8, kernel_size=5, stride=2, use_space_to_depth=True)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b)}}
    out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)
