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
