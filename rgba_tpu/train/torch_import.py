"""Import reference PyTorch ``.pth.tar`` checkpoints into our param trees.

The released weights (README.md:56-58: JournalMask/<lambda>/iter_600000,
JournalRGB/<lambda>/iter_1500000) are torch state dicts.  This module maps
every flax parameter path to its torch key and converts layouts:

  * Conv2d          weight (O,I,kh,kw)  -> HWIO  transpose(2,3,1,0)
  * ConvTranspose2d weight (I,O,kh,kw)  -> HWIO  transpose(2,3,0,1)
    (our ConvTranspose flips spatial dims at call time, so no flip here —
    proven equivalent in tests/test_conv.py)
  * Linear          weight (O,I)        -> (I,O) transpose
  * GDN beta/gamma, bias vectors, entropy-bottleneck matrices: verbatim
    (torch names _matrixK/_biasK/_factorK map to matrixK/biasK/factorK)

Buffers (relative_position_index, CDF tables, scale tables) are rebuilt by
our code and skipped here.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# transform kinds
CONV, DECONV, LINEAR, RAW = "conv", "deconv", "linear", "raw"


def _win_gate_map(flax_rest: str) -> Tuple[str, str]:
    """Map inside a WinGateAttention (torch Win_noShift_Attention)."""
    m = re.match(r"conv_a(\d)/conv(\d)/(kernel|bias)", flax_rest)
    if m:
        i, j, leaf = m.groups()
        return f"conv_a.{i}.conv.{int(j) * 2}.{_leaf(leaf)}", CONV
    m = re.match(r"conv_b(\d)/conv(\d)/(kernel|bias)", flax_rest)
    if m:
        i, j, leaf = m.groups()
        return f"conv_b.{i}.conv.{int(j) * 2}.{_leaf(leaf)}", CONV
    m = re.match(r"conv_b3/(kernel|bias)", flax_rest)
    if m:
        return f"conv_b.3.{_leaf(m.group(1))}", CONV
    m = re.match(r"attn/attn/relative_position_bias_table", flax_rest)
    if m:
        return "attn.attn.relative_position_bias_table", RAW
    m = re.match(r"attn/attn/(qkv|proj)_(kernel|bias)", flax_rest)
    if m:
        which, leaf = m.groups()
        kind = LINEAR if leaf == "kernel" else RAW
        return f"attn.attn.{which}.{_leaf(leaf)}", kind
    raise KeyError(flax_rest)


def _simp_attn_map(flax_rest: str) -> Tuple[str, str]:
    """SimplifiedAttention (AutoEncoderMask_Journal.py:112-136)."""
    m = re.match(r"(trunk_ResBlock\d|attention_ResBlock\d)/conv(\d)/(kernel|bias)",
                 flax_rest)
    if m:
        block, j, leaf = m.groups()
        return f"{block}.conv{j}.{_leaf(leaf)}", CONV
    m = re.match(r"conv1/(kernel|bias)", flax_rest)
    if m:
        return f"conv1.{_leaf(m.group(1))}", CONV
    raise KeyError(flax_rest)


def _dse_map(flax_rest: str) -> Tuple[str, str]:
    m = re.match(r"(input_conv|output_conv)/(kernel|bias)", flax_rest)
    if m:
        return f"{m.group(1)}.{_leaf(m.group(2))}", CONV
    m = re.match(r"enh(\d)/conv(\d)/(kernel|bias)", flax_rest)
    if m:
        i, j, leaf = m.groups()
        return f"enh{i}.conv{j}.{_leaf(leaf)}", CONV
    raise KeyError(flax_rest)


def _leaf(leaf: str) -> str:
    return "weight" if leaf == "kernel" else "bias"


def _prior_map(rest: str) -> Tuple[str, str]:
    """ChannelARPrior -> torch names on the AutoEncoder itself."""
    m = re.match(r"h_a/conv(\d)/(kernel|bias)", rest)
    if m:
        return f"h_a.{int(m.group(1)) * 2}.{_leaf(m.group(2))}", CONV
    m = re.match(r"(h_mean_s|h_scale_s)/(up0|conv1|up2|conv3|up4)(?:/conv)?/(kernel|bias)",
                 rest)
    if m:
        which, stage, leaf = m.groups()
        idx = {"up0": "0.0", "conv1": "2", "up2": "4.0",
               "conv3": "6", "up4": "8.0"}[stage]
        return f"{which}.{idx}.{_leaf(leaf)}", CONV
    m = re.match(r"(cc_mean_transforms|cc_scale_transforms|lrp_transforms)_(\d+)/conv(\d)/(kernel|bias)",
                 rest)
    if m:
        which, i, j, leaf = m.groups()
        return f"{which}.{i}.{int(j) * 2}.{_leaf(leaf)}", CONV
    m = re.match(r"entropy_bottleneck/(matrix|bias|factor)(\d)", rest)
    if m:
        return f"entropy_bottleneck._{m.group(1)}{m.group(2)}", RAW
    if rest == "entropy_bottleneck/quantiles":
        return "entropy_bottleneck.quantiles", RAW
    raise KeyError(rest)


def flax_path_to_torch_rgb(path: str) -> Tuple[str, str]:
    """Map 'encoder/x1/kernel'-style paths to RGB AutoEncoder torch keys."""
    if path.startswith("encoder/"):
        rest = path[len("encoder/"):]
        m = re.match(r"x(\d)/(kernel|bias)", rest)
        if m:
            return f"Encoder.x{m.group(1)}.{_leaf(m.group(2))}", CONV
        m = re.match(r"gdn(\d)/(beta|gamma)", rest)
        if m:
            return f"Encoder.gdn{m.group(1)}.{m.group(2)}", RAW
        m = re.match(r"attention(\d)/(.*)", rest)
        if m:
            sub, kind = _win_gate_map(m.group(2))
            return f"Encoder.attention{m.group(1)}.{sub}", kind
    if path.startswith("decoder/"):
        rest = path[len("decoder/"):]
        m = re.match(r"x(\d)/(kernel|bias)", rest)
        if m:
            k = int(m.group(1))
            kind = CONV if k == 1 else DECONV  # x1 is Conv2d, x2..x4 deconvs
            return f"Decoder.x{k}.{_leaf(m.group(2))}", kind
        m = re.match(r"igdn(\d)/(beta|gamma)", rest)
        if m:
            return f"Decoder.igdn{m.group(1)}.{m.group(2)}", RAW
        m = re.match(r"attention(\d)/(.*)", rest)
        if m:
            sub, kind = _win_gate_map(m.group(2))
            return f"Decoder.attention{m.group(1)}.{sub}", kind
        m = re.match(r"dse/(.*)", rest)
        if m:
            sub, kind = _dse_map(m.group(1))
            return f"Decoder.dse.{sub}", kind
    if path.startswith("prior/"):
        sub, kind = _prior_map(path[len("prior/"):])
        return sub, kind
    raise KeyError(path)


def flax_path_to_torch_mask(path: str) -> Tuple[str, str]:
    """Map paths of MaskCodec to mask AutoEncoder torch keys.

    Torch sequential indices (AutoEncoderMask_Journal.py:153-176) are
    encoded in our layer names (conv0, gdn1, ..., attn8 / attn0..dse9).
    """
    if path.startswith("encoder/"):
        rest = path[len("encoder/"):]
        m = re.match(r"conv(\d)/(kernel|bias)", rest)
        if m:
            return f"EncoderMask.{m.group(1)}.{_leaf(m.group(2))}", CONV
        m = re.match(r"gdn(\d)/(beta|gamma)", rest)
        if m:
            return f"EncoderMask.{m.group(1)}.{m.group(2)}", RAW
        m = re.match(r"attn(\d)/(.*)", rest)
        if m:
            sub, kind = _simp_attn_map(m.group(2))
            return f"EncoderMask.{m.group(1)}.{sub}", kind
    if path.startswith("decoder/"):
        rest = path[len("decoder/"):]
        m = re.match(r"deconv(\d)/(kernel|bias)", rest)
        if m:
            return f"DecoderMask.{m.group(1)}.{_leaf(m.group(2))}", DECONV
        m = re.match(r"igdn(\d)/(beta|gamma)", rest)
        if m:
            return f"DecoderMask.{m.group(1)}.{m.group(2)}", RAW
        m = re.match(r"attn(\d)/(.*)", rest)
        if m:
            sub, kind = _simp_attn_map(m.group(2))
            return f"DecoderMask.{m.group(1)}.{sub}", kind
        m = re.match(r"dse9/(.*)", rest)
        if m:
            sub, kind = _dse_map(m.group(1))
            return f"DecoderMask.9.{sub}", kind
    if path.startswith("prior/"):
        return _prior_map(path[len("prior/"):])
    raise KeyError(path)


def _transform(value: np.ndarray, kind: str, flax_leaf_is_kernel: bool):
    if not flax_leaf_is_kernel or kind == RAW:
        return value
    if kind == CONV:
        return value.transpose(2, 3, 1, 0)
    if kind == DECONV:
        return value.transpose(2, 3, 0, 1)
    if kind == LINEAR:
        return value.transpose(1, 0)
    return value


def convert_state_dict(state_dict: Dict[str, np.ndarray], template,
                       kind: str = "rgb", strict: bool = True):
    """Build a param tree shaped like `template` from a torch state dict.

    state_dict: torch key -> numpy array.  kind: 'rgb' or 'mask'.
    strict: raise if a mapped torch key is missing (buffers are never
    required; unknown extra torch keys are ignored, mirroring the partial
    load at trainRGB.py:83-89).
    """
    mapper = flax_path_to_torch_rgb if kind == "rgb" else flax_path_to_torch_mask

    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in node.items()}
        path = prefix
        torch_key, tkind = mapper(path)
        if torch_key not in state_dict:
            if strict:
                raise KeyError(f"{path} -> {torch_key} missing in state dict")
            return node
        val = np.asarray(state_dict[torch_key], dtype=np.float32)
        leaf = path.rsplit("/", 1)[-1]
        out = _transform(val, tkind, leaf.endswith("kernel"))
        if out.shape != tuple(np.shape(node)):
            raise ValueError(
                f"{path} <- {torch_key}: shape {out.shape} != {np.shape(node)}")
        return out

    return walk(template)


def load_pth_tar(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a {key: numpy} dict (CPU, no grad)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}
