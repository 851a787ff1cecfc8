"""End-to-end CLI integration: train 1 epoch -> checkpoint -> test -> eval.

Deterministic tiny dataset + tiny trunk on the 8-device CPU mesh — the
integration analog of the reference's train/test/eval workflow
(README.md usage), kept small enough for CI."""

import os

import numpy as np
import pytest
from PIL import Image

from sam2unet_tpu.cli import eval_cli, test_cli, train_cli


@pytest.fixture(scope="module")
def dataset_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for split, n in [("train", 8), ("test", 3)]:
        (root / split / "images").mkdir(parents=True)
        (root / split / "masks").mkdir(parents=True)
        for i in range(n):
            h, w = int(rng.integers(40, 80)), int(rng.integers(40, 80))
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            mask = np.zeros((h, w), np.uint8)
            mask[h // 4 : h // 2, w // 4 : w // 2] = 255
            Image.fromarray(img).save(root / split / "images" / f"s{i}.jpg")
            Image.fromarray(mask).save(root / split / "masks" / f"s{i}.png")
    return root


def test_train_test_eval_roundtrip(dataset_dirs, tmp_path):
    save = tmp_path / "run"
    args = train_cli.build_parser().parse_args(
        [
            "--save_path", str(save),
            "--train_image_path", str(dataset_dirs / "train" / "images") + "/",
            "--train_mask_path", str(dataset_dirs / "train" / "masks") + "/",
            "--test_image_path", str(dataset_dirs / "test" / "images") + "/",
            "--test_gt_path", str(dataset_dirs / "test" / "masks") + "/",
            "--epoch", "1",
            "--batch_size", "8",
            "--size", "64",
            "--model_cfg", "hiera_test",
            "--num_workers", "2",
        ]
    )
    train_cli.main(args)

    log = save / "log.txt"
    assert log.exists()
    text = log.read_text()
    assert "epoch-1_loss-" in text and "mIoU" in text

    ckpt = save / "SAM2-UNet_epoch-latest"
    assert ckpt.exists()

    preds = tmp_path / "preds"
    targs = test_cli.build_parser().parse_args(
        [
            "--checkpoint", str(ckpt),
            "--test_image_path", str(dataset_dirs / "test" / "images") + "/",
            "--test_gt_path", str(dataset_dirs / "test" / "masks") + "/",
            "--save_path", str(preds),
            "--size", "64",
            "--model_cfg", "hiera_test",
        ]
    )
    test_cli.main(targs)
    pngs = sorted(os.listdir(preds))
    assert pngs == ["s0.png", "s1.png", "s2.png"]
    arr = np.asarray(Image.open(preds / "s0.png"))
    gt = np.asarray(Image.open(dataset_dirs / "test" / "masks" / "s0.png"))
    assert arr.shape == gt.shape and arr.dtype == np.uint8

    eargs = eval_cli.build_parser().parse_args(
        ["--pred_path", str(preds), "--gt_path",
         str(dataset_dirs / "test" / "masks")]
    )
    eval_cli.main(eargs)
    assert (preds / "log.txt").exists()
    assert "Segmentation Evaluation" in (preds / "log.txt").read_text()
