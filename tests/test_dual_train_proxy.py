"""Dual-train end-to-end accuracy proxy (scripts/dual_train_proxy.py).

The strongest obtainable stand-in for the egress-blocked BASELINE
accuracy gate: train the in-place torch reference and this framework from
one shared init on identical data/schedule, then compare loss
trajectories and the full eval report. The committed full-size table
lives in docs/DUAL_TRAIN.md; this runs a smaller configuration.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_dual_train_matches_reference_end_to_end():
    from scripts.dual_train_proxy import metric_tolerance, run_proxy

    res = run_proxy(size=96, epochs=2, batch=4, n_train=8, n_test=6,
                    max_discs=3)
    t_losses = res["torch"]["losses"]
    j_losses = res["jax"]["losses"]
    # same init + same data + same schedule => same trajectory
    np.testing.assert_allclose(j_losses, t_losses, rtol=0, atol=5e-3)

    tr, jr = res["torch"]["report"], res["jax"]["report"]
    for k in ("mIoU", "mDice"):
        assert abs(float(tr[k]) - float(jr[k])) < 5e-3, (k, tr[k], jr[k])
    # "images_count" is the reference report's name for the total GT
    # component count — multi-disc masks make it > n_test
    assert tr["images_count"] == jr["images_count"] >= 6
    # every instance row (P/R/F1 at each IoU threshold) within its stated
    # tolerance — the reference evaluator's headline includes these
    # (reference eval.py:188-224). Tiny operating point here; the
    # committed docs/DUAL_TRAIN.md run uses the larger one.
    inst = [k for k in tr if k.startswith(("Precision", "Recall",
                                           "F1_Score"))]
    assert inst, "instance rows missing from the report"
    for k in inst:
        d = abs(float(tr[k]) - float(jr[k]))
        # count-quantization on ~15 components: allow 2 flips
        assert d <= max(metric_tolerance(k), 2 / 15 + 1e-9), (k, d)
