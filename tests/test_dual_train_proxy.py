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
    from scripts.dual_train_proxy import run_proxy

    res = run_proxy(size=96, epochs=2, batch=4, n_train=8, n_test=4)
    t_losses = res["torch"]["losses"]
    j_losses = res["jax"]["losses"]
    # same init + same data + same schedule => same trajectory
    np.testing.assert_allclose(j_losses, t_losses, rtol=0, atol=5e-3)

    tr, jr = res["torch"]["report"], res["jax"]["report"]
    for k in ("mIoU", "mDice"):
        assert abs(float(tr[k]) - float(jr[k])) < 5e-3, (k, tr[k], jr[k])
    assert tr["images_count"] == jr["images_count"] == 4
