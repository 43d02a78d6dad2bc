"""Importer mapping coverage + transform invertibility.

Without the released .pth.tar weights in this environment, we verify:
  1. every flax param path of both codecs maps to a torch key (and keys are
     unique) — the mapping is total;
  2. converting a synthetic torch state dict (built by inverse-transforming
     our own params) reproduces the original params bit-exactly — layouts
     round-trip;
  3. layer-level numerical equivalence of each transform is covered by
     tests/test_conv.py (conv/deconv/pixel-shuffle vs torch.functional).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgba_tpu.data.synthetic import synthetic_rgba_batch
from rgba_tpu.models.mask_codec import MaskCodec
from rgba_tpu.models.rgb_codec import RGBCodec
from rgba_tpu.ops.mask_pyramid import mask_pyramid
from rgba_tpu.train.torch_import import (CONV, DECONV, LINEAR, RAW,
                                         convert_state_dict,
                                         flax_path_to_torch_mask,
                                         flax_path_to_torch_rgb)

KEY = jax.random.PRNGKey(0)


def _flat_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_paths(v, f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tree


@pytest.fixture(scope="module")
def mask_params():
    model = MaskCodec()
    mask = jnp.zeros((1, 64, 64, 1))
    return model.init({"params": KEY, "noise": KEY}, mask,
                      training=False)["params"]


@pytest.fixture(scope="module")
def rgb_params():
    model = RGBCodec()
    d = synthetic_rgba_batch(1, 64, 64, seed=0)
    x, mask = jnp.asarray(d["masked_image"]), jnp.asarray(d["alpha"])
    me = mask_pyramid(mask)
    return model.init({"params": KEY, "noise": KEY}, x, mask, mask, me,
                      training=False)["params"]


def _check_total_and_unique(params, mapper):
    keys = []
    for path, _ in _flat_paths(params):
        tk, kind = mapper(path)       # KeyError would fail the test
        assert kind in (CONV, DECONV, LINEAR, RAW)
        keys.append(tk)
    assert len(keys) == len(set(keys)), "duplicate torch keys"
    return keys


def test_mask_mapping_total(mask_params):
    keys = _check_total_and_unique(mask_params, flax_path_to_torch_mask)
    # spot-check exact reference names (AutoEncoderMask_Journal.py:153-176)
    assert "EncoderMask.0.weight" in keys
    assert "EncoderMask.4.trunk_ResBlock1.conv1.weight" in keys
    assert "DecoderMask.9.enh1.conv1.weight" in keys
    assert "entropy_bottleneck._matrix0" in keys
    assert "entropy_bottleneck.quantiles" in keys
    assert "cc_mean_transforms.0.0.weight" in keys
    assert "h_mean_s.0.0.weight" in keys and "h_mean_s.2.weight" in keys


def test_rgb_mapping_total(rgb_params):
    keys = _check_total_and_unique(rgb_params, flax_path_to_torch_rgb)
    # spot-check names from AutoEncoderRGB_Journal.py / TransformRGB.py
    assert "Encoder.x1.weight" in keys
    assert "Encoder.gdn1.beta" in keys
    assert "Encoder.attention1.attn.attn.qkv.weight" in keys
    assert "Encoder.attention1.conv_a.0.conv.0.weight" in keys
    assert "Encoder.attention1.conv_b.3.weight" in keys
    assert "Decoder.x2.weight" in keys
    assert "Decoder.dse.input_conv.weight" in keys
    assert "lrp_transforms.9.4.weight" in keys


def _fake_torch_sd(params, mapper):
    """Inverse-transform our params into a torch-layout state dict."""
    sd = {}
    for path, val in _flat_paths(params):
        tk, kind = mapper(path)
        v = np.asarray(val)
        leaf = path.rsplit("/", 1)[-1]
        if leaf.endswith("kernel"):
            if kind == CONV:
                v = v.transpose(3, 2, 0, 1)
            elif kind == DECONV:
                v = v.transpose(2, 3, 0, 1)
            elif kind == LINEAR:
                v = v.transpose(1, 0)
        sd[tk] = v
    return sd


def test_roundtrip_mask(mask_params):
    sd = _fake_torch_sd(mask_params, flax_path_to_torch_mask)
    restored = convert_state_dict(sd, jax.device_get(mask_params), kind="mask")
    for (p1, a), (p2, b) in zip(_flat_paths(jax.device_get(mask_params)),
                                _flat_paths(restored)):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=p1)


def test_roundtrip_rgb(rgb_params):
    sd = _fake_torch_sd(rgb_params, flax_path_to_torch_rgb)
    restored = convert_state_dict(sd, jax.device_get(rgb_params), kind="rgb")
    for (p1, a), (p2, b) in zip(_flat_paths(jax.device_get(rgb_params)),
                                _flat_paths(restored)):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=p1)


def test_missing_key_strictness(mask_params):
    sd = _fake_torch_sd(mask_params, flax_path_to_torch_mask)
    del sd["EncoderMask.0.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(sd, jax.device_get(mask_params), kind="mask",
                           strict=True)
    # non-strict keeps the template value (partial load, trainRGB.py:83-89)
    restored = convert_state_dict(sd, jax.device_get(mask_params),
                                  kind="mask", strict=False)
    orig = jax.device_get(mask_params)
    np.testing.assert_array_equal(
        np.asarray(restored["encoder"]["conv0"]["kernel"]),
        np.asarray(orig["encoder"]["conv0"]["kernel"]))


def test_load_checkpoint_pth_tar_autodetect(tmp_path, mask_params,
                                            rgb_params):
    """load_checkpoint auto-imports reference .pth.tar files (so -p/-pm and
    resume paths accept the released torch weights directly), inferring the
    codec kind from the template tree."""
    import torch

    from rgba_tpu.train.checkpoint import load_checkpoint, step_from_path

    for params, mapper in ((mask_params, flax_path_to_torch_mask),
                           (rgb_params, flax_path_to_torch_rgb)):
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in _fake_torch_sd(params, mapper).items()}
        path = str(tmp_path / "iter_600000.pth.tar")
        torch.save(sd, path)
        tmpl = jax.device_get(params)
        restored = load_checkpoint(tmpl, path)
        for (p1, a), (p2, b) in zip(_flat_paths(tmpl),
                                    _flat_paths(restored)):
            assert p1 == p2
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=p1)
        assert step_from_path(path) == 600000
