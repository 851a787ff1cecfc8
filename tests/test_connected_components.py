"""Device (jit) connected components vs host native/scipy oracle."""

import numpy as np

from sam2unet_tpu.ops.connected_components import (
    canonicalize_labels,
    get_connected_components,
    label_components_jax,
    label_components_native,
)


def _check_against_native(mask):
    labels_j, counts_j = (np.asarray(a) for a in label_components_jax(mask))
    labels_n, counts_n = label_components_native(mask)
    for i in range(mask.shape[0]):
        a = canonicalize_labels(labels_j[i, 0][None])
        b = canonicalize_labels(labels_n[i, 0][None])
        np.testing.assert_array_equal(a, b)  # identical partitions
        np.testing.assert_array_equal(counts_j[i, 0], counts_n[i, 0])


def test_random_masks_match():
    rng = np.random.default_rng(0)
    mask = (rng.random((3, 1, 48, 48)) > 0.65).astype(np.uint8)
    _check_against_native(mask)


def test_diagonal_and_spiral_shapes():
    m = np.zeros((1, 1, 32, 32), np.uint8)
    # diagonal chain (8-connectivity joins it)
    for i in range(12):
        m[0, 0, i, i] = 1
    # a separate spiral arm
    m[0, 0, 20:30, 20] = 1
    m[0, 0, 20, 20:30] = 1
    m[0, 0, 29, 20:30] = 1
    _check_against_native(m)
    labels, counts = label_components_jax(m)
    labels = np.asarray(labels)
    assert len(np.unique(labels[labels > 0])) == 2


def test_empty_and_full():
    z = np.zeros((1, 1, 16, 16), np.uint8)
    labels, counts = (np.asarray(a) for a in label_components_jax(z))
    assert labels.max() == 0 and counts.max() == 0
    f = np.ones((1, 1, 16, 16), np.uint8)
    labels, counts = (np.asarray(a) for a in label_components_jax(f))
    assert len(np.unique(labels)) == 1
    assert (counts == 256).all()


def test_drop_in_contract():
    """labels/counts shapes follow the reference `_C` contract
    (connected_components.cu:213-282): (N, 1, H, W) int32."""
    rng = np.random.default_rng(1)
    m = (rng.random((2, 1, 20, 20)) > 0.7).astype(np.uint8)
    labels, counts = get_connected_components(m)
    assert labels.shape == m.shape and counts.shape == m.shape
    assert str(labels.dtype) == "int32" and str(counts.dtype) == "int32"
