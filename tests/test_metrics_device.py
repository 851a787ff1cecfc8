"""Device semantic metrics agree with the host evaluator."""

import numpy as np

from sam2unet_tpu.eval.metrics import evaluate_segmentation_performance
from sam2unet_tpu.eval.metrics_device import batched_semantic_metrics


def test_device_metrics_match_host():
    rng = np.random.default_rng(0)
    preds = rng.random((4, 40, 40)).astype(np.float32)
    gts = (rng.random((4, 40, 40)) > 0.5).astype(np.float32) * 255
    valid = np.array([True, True, True, False])

    iou, dice = batched_semantic_metrics(preds, gts, valid)
    iou, dice = np.asarray(iou), np.asarray(dice)
    for i in range(3):
        r = evaluate_segmentation_performance(
            (preds[i] * 255).astype(np.uint8), gts[i]
        )
        # host path thresholds uint8-scaled predictions; match that here
        p8 = (preds[i] * 255).astype(np.uint8) > 25.5
        g = gts[i] > 25.5
        inter = np.logical_and(p8, g).sum()
        union = np.logical_or(p8, g).sum()
        np.testing.assert_allclose(r["semantic_iou"], inter / union)
        # device path uses float threshold 0.1 on probs (no uint8 rounding);
        # agreement is to rounding of the 255-quantization
        np.testing.assert_allclose(iou[i], r["semantic_iou"], atol=0.02)
        np.testing.assert_allclose(dice[i], r["dice_coefficient"], atol=0.02)
    assert iou[3] == 0.0 and dice[3] == 0.0


def test_device_metrics_pixel_valid_matches_reference_exactly():
    """With pixel_valid, the device binarization is BIT-EXACT with the
    reference eval chain (train.py:109-112 min-max normalize over the
    un-padded crop -> x255 -> uint8 truncate -> threshold 25.5), including
    the uniformly-low-confidence case where raw prob thresholding gives a
    different answer."""
    rng = np.random.default_rng(3)
    b, h, w = 3, 32, 48
    # low-confidence sigmoid outputs: raw > 0.1 would be all-empty
    preds = (rng.random((b, h, w)) * 0.08 + 0.01).astype(np.float32)
    gts = (rng.random((b, h, w)) > 0.6).astype(np.float32) * 255
    # per-image letterbox padding [left, top, right, bottom]
    pads = np.array([[0, 0, 0, 0], [4, 2, 4, 2], [0, 8, 0, 0]], np.int32)
    pix = np.zeros((b, h, w), bool)
    for i, (l, t, r, bo) in enumerate(pads):
        pix[i, t : h - bo, l : w - r] = True
    gts *= pix  # letterboxed GT is zero in the pad region
    valid = np.ones(b, bool)

    iou, dice = batched_semantic_metrics(preds, gts, valid, pix)
    raw_iou, _ = batched_semantic_metrics(preds, gts, valid)
    assert np.all(np.asarray(raw_iou) == 0.0)  # the divergent old behavior

    for i in range(b):
        crop = preds[i][pix[i]].reshape(
            h - pads[i, 1] - pads[i, 3], w - pads[i, 0] - pads[i, 2]
        )
        norm = (crop - crop.min()) / (crop.max() - crop.min() + 1e-8)
        p8 = (norm * 255).astype(np.uint8) > 25.5      # reference chain
        g = gts[i][pix[i]].reshape(p8.shape) > 25.5
        inter = np.logical_and(p8, g).sum()
        union = np.logical_or(p8, g).sum()
        want = inter / union if union else 0.0
        # the selected pixel SETS are bit-exact; only the final division
        # differs (device f32 vs numpy f64)
        np.testing.assert_allclose(float(iou[i]), want, rtol=1e-6)


def test_gt_threshold_for_binary_valued_gt():
    """A {0,1}-valued float/int GT must pass gt_threshold=0.5 — the
    default 255*threshold binarization (reference eval.py:88-89 domain)
    would silently zero it. Same mask in both domains => same metrics."""
    rng = np.random.default_rng(0)
    probs = rng.random((2, 16, 16)).astype(np.float32)
    gt01 = (rng.random((2, 16, 16)) > 0.5).astype(np.float32)
    valid = np.ones((2,), bool)
    iou_255, dice_255 = batched_semantic_metrics(probs, gt01 * 255.0, valid)
    iou_01, dice_01 = batched_semantic_metrics(
        probs, gt01, valid, gt_threshold=0.5
    )
    assert np.asarray(iou_255).sum() > 0  # non-degenerate fixture
    np.testing.assert_array_equal(np.asarray(iou_255), np.asarray(iou_01))
    np.testing.assert_array_equal(np.asarray(dice_255), np.asarray(dice_01))
