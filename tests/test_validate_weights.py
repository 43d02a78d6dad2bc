"""End-to-end test of tools/validate_reference_weights.py with
randomly-initialized "released weights".

Saves a random-init reference state dict for both codecs as ``.pth.tar``
files, materializes a synthetic Kodak tree, then runs the validator: it
executes the reference's OWN ``testKodak`` (trainRGB.py:258-334) on CPU
torch AND our ``evaluate_kodak`` with the same weights imported through
torch_import, gating every per-image Bpp/PSNR/MS-SSIM pair at the 0.1%
relative-error north star (BASELINE.md acceptance procedure).  Passing
with random weights pins the whole pipeline — driver import, checkpoint
loading on both sides, eval semantics, log parsing, comparison — so the
day the Drive weights are available the tool is known-good.
"""

import importlib.util
import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_validator():
    spec = importlib.util.spec_from_file_location(
        "validate_reference_weights",
        os.path.join(REPO, "tools", "validate_reference_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_validator_random_init_roundtrip(tmp_path):
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ref_torch

    # random-init "released weights", saved under the reference's iter_N
    # naming so its filename-step parsing (trainRGB.py:90-96) applies.
    # Non-zero bottleneck medians exercise the z rounding offset.
    torch.manual_seed(7)
    tnet = ref_torch.load_model("rgb").AutoEncoder()
    tmask = ref_torch.load_model("mask").AutoEncoder()
    with torch.no_grad():
        tnet.entropy_bottleneck.quantiles[:, 0, 1].uniform_(-0.8, 0.8)
        tmask.entropy_bottleneck.quantiles[:, 0, 1].uniform_(-0.8, 0.8)
    rgb_path = str(tmp_path / "iter_1500000.pth.tar")
    mask_path = str(tmp_path / "iter_600000.pth.tar")
    torch.save(tnet.state_dict(), rgb_path)
    torch.save(tmask.state_dict(), mask_path)

    # smallest Kodak-like geometry that keeps 5-level MS-SSIM valid
    # (min side > (11-1)*2^4 = 160)
    from rgba_tpu.data.synthetic import write_synthetic_kodak_tree
    kodak = str(tmp_path / "kodak")
    write_synthetic_kodak_tree(kodak, n_images=2, height=192, width=256)

    vrw = _load_validator()
    out = str(tmp_path / "report.json")
    rc = vrw.main(["--rgb", rgb_path, "--mask", mask_path,
                   "--kodak", kodak, "--out", out])
    assert rc == 0

    with open(out) as f:
        report = json.load(f)
    assert report["pass"], report
    assert len(report["per_image"]) == 2
    assert report["worst_rel_err"] <= 1e-3
    # sanity: the numbers are real (random weights still produce finite,
    # positive rate and a plausible PSNR range)
    for row in report["per_image"]:
        assert row["bpp"]["ref"] > 0
        assert 0 < row["psnr"]["ref"] < 60
