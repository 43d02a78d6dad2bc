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
    # non-/64 size: the container pads transparently and crops on decode
    b = synthetic_rgba_batch(1, 96, 72, seed=5)
    rgba = np.concatenate([b["image"][0], b["alpha"][0]], -1)
    src = tmp_path / "in.png"
    Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(src)
    blob = tmp_path / "out.rgbc"
    recon = tmp_path / "recon.png"
    codec.main(["encode", str(src), str(blob)])
    assert blob.stat().st_size > 16
    codec.main(["decode", str(blob), str(recon)])
    img = Image.open(recon)
    assert img.mode == "RGBA" and img.size == (72, 96)


def test_codec_cli_preview_slices(tmp_path):
    """--preview-slices k decodes a progressive preview from the SAME
    blob: full-size RGBA out, alpha identical to the full decode (the
    mask stream is always decoded in full)."""
    from rgba_tpu.cli import codec
    from rgba_tpu.native import rans
    if not rans.available():
        pytest.skip("native rans not built")
    b = synthetic_rgba_batch(1, 64, 64, seed=7)
    rgba = np.concatenate([b["image"][0], b["alpha"][0]], -1)
    src = tmp_path / "in.png"
    Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(src)
    blob = tmp_path / "out.rgbc"
    codec.main(["encode", str(src), str(blob)])
    full = tmp_path / "full.png"
    prev = tmp_path / "prev.png"
    codec.main(["decode", str(blob), str(full)])
    codec.main(["decode", str(blob), str(prev), "--preview-slices", "3"])
    a = np.asarray(Image.open(full))
    p = np.asarray(Image.open(prev))
    assert p.shape == a.shape == (64, 64, 4)
    np.testing.assert_array_equal(p[..., 3], a[..., 3])


def test_codec_cli_preview_slices_validation(capsys):
    """--preview-slices is rejected (not silently ignored) on non-decode
    commands, and out-of-range K errors instead of silently clamping."""
    from rgba_tpu.cli import codec
    for argv in (["encode", "a", "b", "--preview-slices", "3"],
                 ["encode-dir", "a", "b", "--preview-slices", "3"],
                 ["decode", "a", "b", "--preview-slices", "-1"],
                 ["decode", "a", "b", "--preview-slices", "11"]):
        with pytest.raises(SystemExit):
            codec.main(argv)
        assert "--preview-slices" in capsys.readouterr().err
    for argv in (["decode", "a", "b", "--interleave", "2"],
                 ["decode-dir", "a", "b", "--interleave", "0"]):
        with pytest.raises(SystemExit):
            codec.main(argv)
        assert "--interleave" in capsys.readouterr().err


def test_codec_cli_legacy_trailer(tmp_path):
    """Blobs written by the pre-container-crop CLI carried an 8-byte h/w
    trailer after an edge-padded container.  The decoder must honor the
    trailer crop, and reject other trailing garbage, instead of silently
    emitting the padded size."""
    from rgba_tpu.cli import codec
    from rgba_tpu.native import rans
    if not rans.available():
        pytest.skip("native rans not built")
    b = synthetic_rgba_batch(1, 96, 72, seed=9)
    rgba = np.concatenate([b["image"][0], b["alpha"][0]], -1)
    src = tmp_path / "in.png"
    Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(src)
    blob_path = tmp_path / "out.rgbc"
    codec.main(["encode", str(src), str(blob_path)])
    blob = blob_path.read_bytes()

    # synthesize a legacy file: container + 8-byte crop trailer (80x64)
    legacy = tmp_path / "legacy.rgbc"
    legacy.write_bytes(blob + (80).to_bytes(4, "little")
                       + (64).to_bytes(4, "little"))
    out = tmp_path / "legacy.png"
    codec.main(["decode", str(legacy), str(out)])
    assert Image.open(out).size == (64, 80)

    # arbitrary trailing garbage is an error, not a silent mis-decode
    bad = tmp_path / "bad.rgbc"
    bad.write_bytes(blob + b"xyz")
    with pytest.raises(SystemExit):
        codec.main(["decode", str(bad), str(tmp_path / "bad.png")])


def test_codec_cli_dir_modes(tmp_path):
    """encode-dir/decode-dir: mixed sizes are grouped, batched, and
    pipelined; every decoded PNG matches the per-image decode."""
    from rgba_tpu.cli import codec
    from rgba_tpu.native import rans
    if not rans.available():
        pytest.skip("native rans not built")
    src = tmp_path / "src"
    enc = tmp_path / "enc"
    rec = tmp_path / "rec"
    os.makedirs(src)
    sizes = [(64, 64), (64, 64), (64, 64), (96, 72)]
    for i, (h, w) in enumerate(sizes):
        b = synthetic_rgba_batch(1, h, w, seed=20 + i)
        rgba = np.concatenate([b["image"][0], b["alpha"][0]], -1)
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            src / f"im{i}.png")
    codec.main(["encode-dir", str(src), str(enc), "-b", "2"])
    blobs = sorted(os.listdir(enc))
    assert blobs == ["im0.rgbc", "im1.rgbc", "im2.rgbc", "im3.rgbc"]
    codec.main(["decode-dir", str(enc), str(rec), "-b", "2"])
    for i, (h, w) in enumerate(sizes):
        img = Image.open(rec / f"im{i}.png")
        assert img.mode == "RGBA" and img.size == (w, h), (i, img.size)
    # dir decode agrees with the single-file path
    one = tmp_path / "one.png"
    codec.main(["decode", str(enc / "im3.rgbc"), str(one)])
    np.testing.assert_array_equal(np.asarray(Image.open(one)),
                                  np.asarray(Image.open(rec / "im3.png")))
    # sub-batch chain interleave is bit-identical to the default decode
    rec2 = tmp_path / "rec2"
    codec.main(["decode-dir", str(enc), str(rec2), "-b", "2",
                "--interleave", "2"])
    for i in range(len(sizes)):
        np.testing.assert_array_equal(
            np.asarray(Image.open(rec2 / f"im{i}.png")),
            np.asarray(Image.open(rec / f"im{i}.png")), err_msg=str(i))
