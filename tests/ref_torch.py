"""Import the reference PyTorch modules from /root/reference for parity tests.

The reference depends on `timm`, `compressai` and `torchvision`, none of
which are installed.  The pieces it actually *uses* from them are tiny
(masked_win_attention.py:3, Masked_Attention.py:8-10, TransformRGB.py:11-14,
AutoEncoderRGB_Journal.py:4-17) — we stub them in sys.modules with faithful
re-implementations so the real reference layer/model code runs unmodified.

The entropy-model stubs (EntropyBottleneck / GaussianConditional) only
reproduce CompressAI's *parameter shapes and names* (so state-dict export
and our torch_import mapping are exercised on the real module tree); their
forward is not needed by any parity test — entropy math is pinned separately
by tests/test_entropy.py golden values.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"


def _stub_timm():
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):  # drop_path=0 everywhere in the reference
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


def _stub_torchvision():
    tv = types.ModuleType("torchvision")
    utils = types.ModuleType("torchvision.utils")
    utils.save_image = lambda *a, **k: None
    tv.utils = utils
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", utils)
    sys.modules.setdefault("torchvision.datasets", tv.datasets)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)


def _stub_compressai():
    """conv3x3 / subpel_conv3x3 per CompressAI's public definitions; entropy
    models as shape-faithful parameter holders."""
    root = types.ModuleType("compressai")
    clayers = types.ModuleType("compressai.layers")
    cent = types.ModuleType("compressai.entropy_models")
    cans = types.ModuleType("compressai.ans")
    cmodels = types.ModuleType("compressai.models")

    def conv3x3(in_ch, out_ch, stride=1):
        return nn.Conv2d(in_ch, out_ch, kernel_size=3, stride=stride,
                         padding=1)

    def subpel_conv3x3(in_ch, out_ch, r=1):
        return nn.Sequential(
            nn.Conv2d(in_ch, out_ch * r * r, kernel_size=3, padding=1),
            nn.PixelShuffle(r))

    class _Unused(nn.Module):  # imported by the reference, never built
        def __init__(self, *a, **k):
            super().__init__()

    clayers.conv3x3 = conv3x3
    clayers.subpel_conv3x3 = subpel_conv3x3
    clayers.AttentionBlock = _Unused
    clayers.ResidualBlock = _Unused
    clayers.ResidualBlockUpsample = _Unused
    clayers.ResidualBlockWithStride = _Unused

    class EntropyBottleneck(nn.Module):
        """Parameter tree of compressai's EntropyBottleneck: _matrix{k}
        (C, f_{k+1}, f_k), _bias{k} (C, f_{k+1}, 1), _factor{k}, quantiles
        (C, 1, 3) — matches rgba_tpu/entropy/bottleneck.py."""

        def __init__(self, channels, filters=(3, 3, 3, 3), init_scale=10.0):
            super().__init__()
            f = (1,) + tuple(filters) + (1,)
            scale = init_scale ** (1 / (len(filters) + 1))
            for i in range(len(filters) + 1):
                init_v = float(np.log(np.expm1(1 / scale / f[i + 1])))
                m = torch.full((channels, f[i + 1], f[i]), init_v)
                setattr(self, f"_matrix{i}", nn.Parameter(m))
                b = torch.empty(channels, f[i + 1], 1).uniform_(-0.5, 0.5)
                setattr(self, f"_bias{i}", nn.Parameter(b))
                if i < len(filters):
                    fac = torch.zeros(channels, f[i + 1], 1)
                    setattr(self, f"_factor{i}", nn.Parameter(fac))
            q = torch.tensor([-init_scale, 0.0, init_scale])
            self.quantiles = nn.Parameter(
                q.repeat(channels, 1, 1))

    class GaussianConditional(nn.Module):
        def __init__(self, scale_table, *a, **k):
            super().__init__()

    class _RansStub:
        def __init__(self, *a, **k):
            raise RuntimeError("rANS stub — not usable in parity tests")

    class CompressionModel(nn.Module):
        def __init__(self, entropy_bottleneck_channels=None, init_weights=None):
            super().__init__()

    cent.EntropyBottleneck = EntropyBottleneck
    cent.GaussianConditional = GaussianConditional
    cans.BufferedRansEncoder = _RansStub
    cans.RansDecoder = _RansStub
    cmodels.CompressionModel = CompressionModel
    root.layers = clayers
    root.entropy_models = cent
    root.ans = cans
    root.models = cmodels
    sys.modules.setdefault("compressai", root)
    sys.modules.setdefault("compressai.layers", clayers)
    sys.modules.setdefault("compressai.entropy_models", cent)
    sys.modules.setdefault("compressai.ans", cans)
    sys.modules.setdefault("compressai.models", cmodels)


def install_stubs():
    _stub_timm()
    _stub_torchvision()
    _stub_compressai()


def load_layers():
    """Import /root/reference/layers as the package `layers` (the reference
    has no __init__.py; models import it absolutely)."""
    install_stubs()
    if "layers" not in sys.modules:
        pkg = types.ModuleType("layers")
        pkg.__path__ = [f"{REF}/layers"]
        sys.modules["layers"] = pkg
    mods = {}
    for name in ("GDN", "masked_win_attention", "win_attention",
                 "Masked_Attention", "Attention", "TransformRGB",
                 "SupplyMask"):
        mods[name] = importlib.import_module(f"layers.{name}")
    return mods


def load_model(which: str):
    """Load AutoEncoderRGB_Journal / AutoEncoderMask_Journal as a module."""
    load_layers()
    fname = {"rgb": "AutoEncoderRGB_Journal",
             "mask": "AutoEncoderMask_Journal"}[which]
    modname = f"ref_{fname}"
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(
        modname, f"{REF}/models/{fname}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def state_dict_numpy(module: nn.Module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2))).float()


def nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)
