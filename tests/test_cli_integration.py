"""End-to-end driver smoke tests on a synthetic ACDC dataset — the
reference's __main__ smoke-test pattern (SURVEY.md §4) upgraded to real
assertions. Uses tiny crops to bound CPU compile time."""
import json
import os
import sys

import numpy as np
import pytest

from saunet_tpu.data import nifti

SLOW = os.environ.get("SKIP_SLOW_TESTS", "") == "1"


def _make_synthetic_acdc(root, n_patients=3, frames=(1, 12), test=False):
    rs = np.random.RandomState(0)
    for p in range(1, n_patients + 1):
        sub = ("testing", "testing") if test else ("training",)
        pdir = os.path.join(root, *sub, f"patient{p:03d}")
        os.makedirs(pdir, exist_ok=True)
        for fr in frames:
            h, w, z = 40, 44, 2
            img = (rs.rand(h, w, z) * 300).astype(np.float32)
            base = os.path.join(pdir, f"patient{p:03d}_frame{fr:02d}")
            nifti.save(img, base + ".nii.gz", pixdim=(1.3, 1.3, 10))
            if not test:
                seg = rs.randint(0, 4, size=(h, w, z)).astype(np.uint8)
                nifti.save(seg, base + "_gt.nii.gz", pixdim=(1.3, 1.3, 10))


@pytest.mark.skipif(SLOW, reason="SKIP_SLOW_TESTS=1")
def test_train_cli_one_epoch(tmp_path):
    from saunet_tpu.cli.train import main

    root = str(tmp_path / "data")
    _make_synthetic_acdc(root)
    ckpt = str(tmp_path / "ckpt")
    main([
        "--data-root", root, "--ckpt", ckpt, "--num_epoch", "1",
        "--batch_size_per_device", "1", "--crop_size", "32",
        "--dtype", "float32", "--k_split", "1", "--id", "smoke",
        "--no_deform",
    ])
    # checkpoint written at final epoch + history recorded
    runs = os.listdir(ckpt)
    assert len(runs) == 1
    files = os.listdir(os.path.join(ckpt, runs[0]))
    assert any(f.startswith("state_epoch_1") for f in files)
    assert "best.json" in files
    hist = json.load(open(os.path.join(
        ckpt, runs[0], "history_epoch_1.json")))
    assert len(hist["train"]["loss"]) == 1
    assert np.isfinite(hist["train"]["loss"][0])


@pytest.mark.skipif(SLOW, reason="SKIP_SLOW_TESTS=1")
def test_test_and_pack_cli(tmp_path):
    from saunet_tpu.cli.train import main as train_main
    from saunet_tpu.cli.test_and_pack import main as pack_main

    root = str(tmp_path / "data")
    _make_synthetic_acdc(root)
    _make_synthetic_acdc(root, n_patients=2, test=True)
    ckpt = str(tmp_path / "ckpt")
    train_main([
        "--data-root", root, "--ckpt", ckpt, "--num_epoch", "1",
        "--batch_size_per_device", "1", "--crop_size", "32",
        "--dtype", "float32", "--id", "smoke", "--no_deform",
    ])
    run = os.listdir(ckpt)[0]
    state_file = [f for f in os.listdir(os.path.join(ckpt, run))
                  if f.startswith("state_")][0]

    out = str(tmp_path / "out")
    res = str(tmp_path / "res")
    pack_main([
        "--id", "smoke", "--checkpoint", os.path.join(ckpt, run, state_file),
        "--data-root", root, "--crop_size", "32", "--dtype", "float32",
        "--save_test_path", out, "--result", res,
    ])
    nii = [f for f in os.listdir(out) if f.endswith(".nii.gz")]
    assert len(nii) == 4  # 2 patients x 2 frames (ED/ES)
    # prediction volumes repacked to original geometry
    pred = nifti.load(os.path.join(out, nii[0]))
    assert pred.data.shape == (40, 44, 2)
    assert set(np.unique(pred.data)) <= {0, 1, 2, 3}
    # visualization PNGs exist
    pngs = [f for f in os.listdir(os.path.join(res, "smoke"))
            if f.endswith(".png")]
    assert len(pngs) == 8  # 4 volumes x 2 slices
    # timing metadata recorded
    assert os.path.exists(os.path.join(out, "timing.json"))

    # --attention_map exports the decoder attention + gate maps per volume
    # (exceeds the reference: its flag fetches the maps and never saves
    # them, /root/reference/test_and_pack.py:116-120)
    out2 = str(tmp_path / "out2")
    res2 = str(tmp_path / "res2")
    pack_main([
        "--id", "smoke", "--checkpoint", os.path.join(ckpt, run, state_file),
        "--data-root", root, "--crop_size", "32", "--dtype", "float32",
        "--save_test_path", out2, "--result", res2,
        "--no-visualize", "--attention_map",
    ])
    att_dir = os.path.join(res2, "smoke", "attention")
    att_pngs = [f for f in os.listdir(att_dir) if f.endswith(".png")]
    # 4 volumes x 2 z-slices x 7 maps (att2..att5 + gate1..gate3)
    assert len(att_pngs) == 4 * 2 * 7, sorted(att_pngs)[:10]
    for name in ("att2", "att5", "gate1", "gate3"):
        assert any(name in f for f in att_pngs)
