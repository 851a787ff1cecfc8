"""The bench MFU claim rests on flops_audit — pin its sanity."""

import numpy as np

from sam2unet_tpu.utils.flops_audit import audit


def test_flops_audit_sane_and_scales():
    out = audit("sam2_hiera_t", size=128, mode="both")
    assert np.isfinite(out["infer"]) and out["infer"] > 1e8
    # backward adds real work but the frozen trunk needs dx only: train
    # lands between 1.5x and 3.5x forward
    assert 1.5 * out["infer"] < out["train"] < 3.5 * out["infer"]

    # quadrupling the pixels should scale FLOPs ~4x (window attention is
    # linear in tokens); allow padding slack
    big = audit("sam2_hiera_t", size=256, mode="infer")
    ratio = big["infer"] / out["infer"]
    assert 3.0 < ratio < 5.5, ratio
