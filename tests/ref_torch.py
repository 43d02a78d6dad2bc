"""Import the reference PyTorch modules from /root/reference for parity tests.

The reference depends on `timm`, `compressai` and `torchvision`, none of
which are installed.  The pieces it actually *uses* from them are tiny
(masked_win_attention.py:3, Masked_Attention.py:8-10, TransformRGB.py:11-14,
AutoEncoderRGB_Journal.py:4-17) — we stub them in sys.modules with faithful
re-implementations so the real reference layer/model code runs unmodified.

The entropy-model stubs (EntropyBottleneck / GaussianConditional)
reproduce CompressAI's parameter shapes/names AND its *eval-path forward*
(logits-cumulative chain + sign-trick likelihood; erfc bin mass with the
0.11 scale bound), so the reference models' complete `AutoEncoder.forward`
— transforms AND rate estimation (AutoEncoderRGB_Journal.py:203-296,
AutoEncoderMask_Journal.py:248-316) — runs unmodified for end-to-end
x_hat/bpp parity tests.  The training path (additive-noise quantization)
is implemented too but cannot be parity-tested (RNG streams differ).
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


def _to_tensor(pic):
    """torchvision.transforms.functional.to_tensor for PIL inputs: HWC
    uint8 -> CHW float / 255 (the only form the reference feeds it —
    MYdataset.py:230-236 reads PNGs)."""
    arr = np.array(pic, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return torch.from_numpy(
        np.ascontiguousarray(arr.transpose(2, 0, 1))).float().div(255.0)


class _Compose:
    """transforms.Compose — the reference only builds empty pipelines
    (MYdataset.py:216-218, pull_item's `transforms.Compose([])`)."""

    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


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
    # enrich whichever instances are installed (idempotent re-entry):
    # the reference drivers/datasets additionally use Compose,
    # functional.to_tensor and import (but never build) ImageFolder
    tv = sys.modules["torchvision"]
    tvt = sys.modules["torchvision.transforms"]
    tvt.Compose = _Compose
    func = getattr(tvt, "functional",
                   types.ModuleType("torchvision.transforms.functional"))
    func.to_tensor = _to_tensor
    tvt.functional = func
    tv.transforms = tvt
    sys.modules["torchvision.transforms.functional"] = func
    sys.modules["torchvision.datasets"].ImageFolder = object
    tv.datasets = sys.modules["torchvision.datasets"]
    tv.utils = sys.modules["torchvision.utils"]


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

    def _quantize(inputs, mode, means=None):
        """CompressAI EntropyModel.quantize: additive noise in training,
        round-around-means dequantize at eval."""
        if mode == "noise":
            return inputs + torch.empty_like(inputs).uniform_(-0.5, 0.5)
        outputs = inputs.clone()
        if means is not None:
            outputs = outputs - means
        outputs = torch.round(outputs)
        if means is not None:
            outputs = outputs + means
        return outputs

    class EntropyBottleneck(nn.Module):
        """CompressAI's EntropyBottleneck: _matrix{k} (C, f_{k+1}, f_k),
        _bias{k} (C, f_{k+1}, 1), _factor{k}, quantiles (C, 1, 3), plus the
        faithful eval forward (logits-cumulative chain, sign-trick
        likelihood, 1e-9 likelihood bound) — matches
        rgba_tpu/entropy/bottleneck.py, which the full-forward parity tests
        pin against it."""

        def __init__(self, channels, filters=(3, 3, 3, 3), init_scale=10.0):
            super().__init__()
            self.filters = tuple(filters)
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

        def _get_medians(self):
            return self.quantiles[:, :, 1:2]

        def _logits_cumulative(self, inputs, stop_gradient):
            logits = inputs
            for i in range(len(self.filters) + 1):
                m = getattr(self, f"_matrix{i}")
                b = getattr(self, f"_bias{i}")
                if stop_gradient:
                    m, b = m.detach(), b.detach()
                logits = torch.matmul(torch.nn.functional.softplus(m),
                                      logits) + b
                if i < len(self.filters):
                    f = getattr(self, f"_factor{i}")
                    if stop_gradient:
                        f = f.detach()
                    logits = logits + torch.tanh(f) * torch.tanh(logits)
            return logits

        def _likelihood(self, inputs):
            lower = self._logits_cumulative(inputs - 0.5, stop_gradient=False)
            upper = self._logits_cumulative(inputs + 0.5, stop_gradient=False)
            sign = -torch.sign(lower + upper).detach()
            return torch.abs(torch.sigmoid(sign * upper) -
                             torch.sigmoid(sign * lower))

        def forward(self, x):
            # (B, C, ...) -> (C, 1, B*spatial), per compressai's perm dance
            perm = list(range(x.dim()))
            perm[0], perm[1] = perm[1], perm[0]
            xt = x.permute(*perm).contiguous()
            shape = xt.size()
            values = xt.reshape(xt.size(0), 1, -1)
            outputs = _quantize(values, "noise" if self.training
                                else "dequantize", self._get_medians())
            likelihood = self._likelihood(outputs).clamp_min(1e-9)
            outputs = outputs.reshape(shape).permute(*perm).contiguous()
            likelihood = likelihood.reshape(shape).permute(*perm).contiguous()
            return outputs, likelihood

    class GaussianConditional(nn.Module):
        """CompressAI's GaussianConditional eval forward: erfc integer-bin
        mass with scales lower-bounded at 0.11 (the reference constructs it
        with scale_table=None, AutoEncoderRGB_Journal.py:201)."""

        def __init__(self, scale_table, scale_bound=0.11, *a, **k):
            super().__init__()
            assert scale_table is None  # as the reference constructs it
            self.scale_bound = scale_bound

        @staticmethod
        def _standardized_cumulative(x):
            return 0.5 * torch.erfc(-x * (2 ** -0.5))

        def _likelihood(self, inputs, scales, means=None):
            values = inputs if means is None else inputs - means
            scales = scales.clamp_min(self.scale_bound)
            values = torch.abs(values)
            upper = self._standardized_cumulative((0.5 - values) / scales)
            lower = self._standardized_cumulative((-0.5 - values) / scales)
            return upper - lower

        def forward(self, inputs, scales, means=None):
            outputs = _quantize(inputs, "noise" if self.training
                                else "dequantize", means)
            likelihood = self._likelihood(outputs, scales,
                                          means).clamp_min(1e-9)
            return outputs, likelihood

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


def load_driver(which: str):
    """Import the reference DRIVER (trainRGB.py / trainmask.py) as a module
    so its own ``testKodak`` (trainRGB.py:258-334, trainmask.py:242-293)
    can be executed on CPU.

    The module body only builds an argparse parser and sets globals (the
    train/eval flow is under ``__main__``, trainRGB.py:336); CUDA is never
    touched at import (``device`` is just the string 'cuda:0', which the
    caller must override to 'cpu' before running anything).  Reference
    packages (models/, my_datasets/, metrics/, Meter.py) resolve as
    namespace packages by putting /root/reference on sys.path."""
    load_layers()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    fname = {"rgb": "trainRGB", "mask": "trainmask"}[which]
    modname = f"ref_{fname}"
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(modname, f"{REF}/{fname}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    mod.device = "cpu"
    return mod


def state_dict_numpy(module: nn.Module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2))).float()


def nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)
