"""Data pipeline + evaluator tests (synthetic images on disk)."""

import numpy as np
import pytest
from PIL import Image

from sam2unet_tpu.data import transforms as T
from sam2unet_tpu.data.dataset import EvalDataset, TrainDataset
from sam2unet_tpu.eval.metrics import (
    MIOU,
    evaluate_dataset,
    evaluate_segmentation_performance,
    print_eval_report,
)


# ------------------------------------------------------------- transforms

def test_color_ops_basics():
    rng = np.random.default_rng(0)
    img = rng.random((3, 16, 16)).astype(np.float32)
    assert np.allclose(T.adjust_brightness(img, 1.0), np.clip(img, 0, 1))
    g = T.rgb_to_grayscale(img)
    assert g.shape == img.shape and np.allclose(g[0], g[1])
    # saturating to gray at factor 0
    assert np.allclose(T.adjust_saturation(img, 0.0), g, atol=1e-6)
    # hue shift by 0 is identity; +0.5 twice is identity (cyclic)
    assert np.allclose(T.adjust_hue(img, 0.0), img, atol=1e-5)
    twice = T.adjust_hue(T.adjust_hue(img, 0.5), 0.5)
    assert np.allclose(twice, img, atol=1e-5)
    assert np.allclose(T.adjust_gamma(img, 1.0), img, atol=1e-6)


def test_gaussian_blur_preserves_mean():
    rng = np.random.default_rng(1)
    img = rng.random((3, 32, 32)).astype(np.float32)
    out = T.gaussian_blur(img, 5)
    assert out.shape == img.shape
    np.testing.assert_allclose(out.mean(), img.mean(), atol=5e-3)
    assert out.var() < img.var()


def test_letterbox_padding_metadata():
    img = np.ones((3, 100, 200), np.float32)
    out, (left, top, right, bottom) = T.letterbox(img, 64)
    assert out.shape == (3, 64, 64)
    # longest side 200 -> 64, so h = round(100*0.32) = 32, pad 32 split 16/16
    assert (left, right) == (0, 0)
    assert (top, bottom) == (16, 16)
    assert np.all(out[:, :16] == 0) and np.all(out[:, -16:] == 0)
    np.testing.assert_allclose(out[:, 16:48], 1.0, rtol=1e-6)


@pytest.fixture()
def tiny_dataset(tmp_path):
    img_dir = tmp_path / "images"
    gt_dir = tmp_path / "masks"
    img_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
        m = (rng.random((40, 56)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(m).save(gt_dir / f"im{i}.png")
    return str(img_dir) + "/", str(gt_dir) + "/"


def test_train_dataset_epoch(tiny_dataset):
    img_dir, gt_dir = tiny_dataset
    ds = TrainDataset(img_dir, gt_dir, size=64, seed=3)
    batches = list(ds.epoch(batch_size=2, epoch=0, num_workers=2))
    assert len(batches) == 3
    assert batches[0].image.shape == (2, 64, 64, 3)
    assert batches[0].label.shape == (2, 64, 64, 1)
    assert batches[-1].valid == 1  # 5 % 2
    assert set(np.unique(batches[0].label)) <= {0.0, 1.0}
    # determinism given (seed, epoch)
    again = list(ds.epoch(batch_size=2, epoch=0, num_workers=2))
    np.testing.assert_array_equal(batches[0].image, again[0].image)


def test_abandoned_epoch_stops_producer_thread():
    """Breaking out of an epoch mid-iteration must terminate the producer
    (it blocks on the bounded queue otherwise, leaking the thread, its pool,
    and the in-flight batches every abandoned epoch)."""
    import threading
    import time

    from sam2unet_tpu.data.dataset import _batched_prefetch

    before = {t.ident for t in threading.enumerate()}

    def produce(i):
        return (np.zeros((3, 8, 8), np.float32),
                np.zeros((1, 8, 8), np.float32))

    gen = _batched_prefetch(np.arange(64), produce, batch_size=4, size=8,
                            num_workers=2)
    next(gen)
    gen.close()  # GeneratorExit -> finally must stop + join the producer
    deadline = time.time() + 10.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer threads leaked: {leaked}"


def test_eval_dataset_contract(tiny_dataset):
    img_dir, gt_dir = tiny_dataset
    ds = EvalDataset(img_dir, gt_dir, size=64)
    image, gt, name, padding = ds.load_data()
    assert image.shape == (1, 64, 64, 3)
    assert gt.shape == (40, 56)
    assert name == "im0.jpg"
    left, top, right, bottom = padding
    assert left == right == 0 and top + bottom == 64 - round(40 * 64 / 56)
    ds.reset_index()
    b = next(ds.batches(batch_size=8))
    assert b["image"].shape == (8, 64, 64, 3)
    assert b["valid"] == 5


# ---------------------------------------------------------------- metrics

def test_metrics_perfect_match():
    m = np.zeros((32, 32), np.uint8)
    m[4:12, 4:12] = 255
    m[20:28, 20:28] = 255
    r = evaluate_segmentation_performance(m, m)
    assert r["semantic_iou"] == 1.0
    assert r["dice_coefficient"] == 1.0
    assert r["count_gt"] == r["count_pred"] == 2
    assert r["instance_precision_50"] == 1.0
    assert r["instance_recall_75"] == 1.0


def test_metrics_partial_overlap():
    gt = np.zeros((32, 32), np.uint8)
    gt[0:10, 0:10] = 255
    pred = np.zeros((32, 32), np.uint8)
    pred[0:10, 5:15] = 255  # IoU = 50/150 = 1/3
    r = evaluate_segmentation_performance(pred, gt)
    np.testing.assert_allclose(r["semantic_iou"], 1 / 3)
    assert r["instance_precision_50"] == 0.0
    # diagonal-touching blobs merge under 8-connectivity
    m8 = np.zeros((8, 8), np.uint8)
    m8[0, 0] = 255
    m8[1, 1] = 255
    r8 = evaluate_segmentation_performance(m8, m8)
    assert r8["count_gt"] == 1


def test_dataset_aggregation_and_report(tmp_path):
    gt = np.zeros((16, 16), np.uint8)
    gt[2:8, 2:8] = 255
    r1 = evaluate_segmentation_performance(gt, gt)
    r2 = evaluate_segmentation_performance(np.zeros_like(gt), gt)
    final = evaluate_dataset([r1, r2])
    np.testing.assert_allclose(final[MIOU], 0.5)
    np.testing.assert_allclose(final["Precision_50"], 1.0)  # 1 TP / 1 pred
    np.testing.assert_allclose(final["Recall_50"], 0.5)     # 1 TP / 2 gt
    log = tmp_path / "log.txt"
    text = print_eval_report(final, title="epoch-1_loss-0.500", log_path=str(log))
    assert log.read_text() == text
    assert "mIoU" in text and "=" * 25 not in ""  # format smoke
    lines = text.splitlines()
    assert lines[1] == "=" * len(lines[2])


def test_empty_masks_no_nan():
    z = np.zeros((8, 8), np.uint8)
    r = evaluate_segmentation_performance(z, z)
    assert r["semantic_iou"] == 0.0 and r["dice_coefficient"] == 0.0
    assert r["instance_f1_50"] == 0.0


def test_greedy_matcher_equivalent_to_reference_loop():
    """The vectorized greedy matcher (eval/metrics.py::_greedy_tp) must
    reproduce the literal reference greedy loop (eval.py:124-152) on
    randomized IoU matrices, including heavy ties and degenerate shapes."""
    from sam2unet_tpu.eval.metrics import _greedy_tp

    def reference_loop(iou_m, thresh):
        n_pred, n_gt = iou_m.shape
        tp = 0
        matched = set()
        for p in range(n_pred):
            best_iou, best_g = 0.0, -1
            for g in range(n_gt):
                if g in matched:
                    continue
                if iou_m[p, g] > best_iou:
                    best_iou, best_g = iou_m[p, g], g
            if best_iou >= thresh:
                tp += 1
                matched.add(best_g)
        return tp

    rng = np.random.default_rng(0)
    shapes = [(0, 0), (0, 5), (5, 0), (1, 1), (3, 7), (7, 3), (20, 20)]
    for trial in range(50):
        n_p, n_g = shapes[trial % len(shapes)]
        # quantized values force frequent exact ties
        iou = rng.integers(0, 5, size=(n_p, n_g)).astype(np.float64) / 4.0
        for thresh in (0.5, 0.75):
            assert _greedy_tp(iou, thresh) == reference_loop(iou, thresh), (
                trial, thresh, iou,
            )
