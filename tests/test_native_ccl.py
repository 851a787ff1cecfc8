"""Native C++ CCL: builds from source and matches the scipy oracle."""

import shutil

import numpy as np
import pytest


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
@pytest.mark.slow
def test_native_build_and_match(tmp_path):
    from sam2unet_tpu.ops import build_native
    from sam2unet_tpu.ops import connected_components as cc

    built = build_native.build(verbose=False)
    assert any(p.endswith("libccl.so") for p in built)

    # The build lands inside the package (wheel package-data layout,
    # mirroring the reference's sam2/_C.pyd) and the locator resolves it
    # with the package copy taking precedence over the csrc/build mirror.
    from sam2unet_tpu.ops.native_lib import find_native_lib, native_search_paths

    path = find_native_lib("libccl.so")
    assert path is not None and path == native_search_paths("libccl.so")[0]
    assert "_native" in path

    cc._native = None  # force reload of the freshly built library
    lib = cc._load_native()
    assert lib, "native library failed to load"

    from scipy import ndimage

    rng = np.random.default_rng(7)
    mask = (rng.random((2, 1, 64, 64)) > 0.6).astype(np.uint8)
    labels, counts = cc.label_components_native(mask)
    s8 = np.ones((3, 3), np.int32)
    for i in range(2):
        lab, num = ndimage.label(mask[i, 0], structure=s8)
        assert labels[i, 0].max() == num
        a = cc.canonicalize_labels(labels[i, 0][None])
        b = cc.canonicalize_labels(lab[None])
        np.testing.assert_array_equal(a, b)
        areas = np.bincount(lab.ravel(), minlength=num + 1)
        areas[0] = 0
        np.testing.assert_array_equal(counts[i, 0], areas[lab])
