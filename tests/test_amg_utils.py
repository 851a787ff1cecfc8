"""AMG utility correctness (RLE round trip, boxes, stability, NMS)."""

import numpy as np

from sam2unet_tpu.utils.amg import (
    area_from_rle,
    batched_mask_to_box,
    batched_nms,
    box_xyxy_to_xywh,
    build_point_grid,
    calculate_stability_score,
    generate_crop_boxes,
    mask_to_rle,
    remove_small_regions,
    rle_to_mask,
    uncrop_masks,
)


def test_unpack_bits_matches_unpackbits():
    from sam2unet_tpu.utils.amg import unpack_bits

    rng = np.random.default_rng(1)
    packed = rng.integers(0, 256, (5, 7, 9), dtype=np.uint8)
    want = np.unpackbits(packed, axis=-1)[..., :70].astype(bool)
    np.testing.assert_array_equal(unpack_bits(packed, 70), want)
    # scratch path: same values, and a second call with different data
    # reuses the buffer without stale bits
    got1 = unpack_bits(packed, 70, scratch_key="t")
    np.testing.assert_array_equal(got1, want)
    packed2 = rng.integers(0, 256, (5, 7, 9), dtype=np.uint8)
    want2 = np.unpackbits(packed2, axis=-1)[..., :70].astype(bool)
    got2 = unpack_bits(packed2, 70, scratch_key="t")
    np.testing.assert_array_equal(got2, want2)


def test_rle_roundtrip_and_area():
    rng = np.random.default_rng(0)
    masks = rng.random((4, 13, 17)) > 0.5
    rles = mask_to_rle(masks)
    for i, rle in enumerate(rles):
        back = rle_to_mask(rle)
        np.testing.assert_array_equal(back, masks[i])
        assert area_from_rle(rle) == int(masks[i].sum())


def test_mask_to_rle_empty_batch():
    # a point batch can have every candidate filtered out (found by the
    # TPU AMG smoke: reshape(0, -1) raises in numpy)
    assert mask_to_rle(np.zeros((0, 13, 17), bool)) == []


def test_batched_mask_to_box():
    m = np.zeros((2, 20, 30), bool)
    m[0, 3:9, 5:12] = True  # box (5, 3, 11, 8)
    boxes = batched_mask_to_box(m)
    np.testing.assert_array_equal(boxes[0], [5, 3, 11, 8])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])  # empty mask
    # integer like the reference (torch bool*arange -> int64), so generate()
    # records serialize 'bbox'/'crop_box' as ints, not 5.0-style floats
    assert boxes.dtype == np.int64
    assert batched_mask_to_box(np.zeros((0, 4, 4), bool)).dtype == np.int64
    xywh = box_xyxy_to_xywh(boxes[0])
    assert xywh.dtype == np.int64
    np.testing.assert_array_equal(xywh, [5, 3, 6, 5])


def test_stability_score():
    logits = np.full((1, 10, 10), 5.0)
    logits[0, :5] = -5.0
    s = calculate_stability_score(logits, mask_threshold=0.0,
                                  threshold_offset=1.0)
    np.testing.assert_allclose(s, [1.0])
    # near-threshold mask is unstable
    soft = np.full((1, 10, 10), 0.5)
    s2 = calculate_stability_score(soft, 0.0, 1.0)
    assert s2[0] == 0.0


def test_point_grid_and_crops():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() > 0 and g.max() < 1
    boxes, layers = generate_crop_boxes((100, 150), n_layers=1,
                                        overlap_ratio=0.2)
    assert boxes[0] == [0, 0, 150, 100] and layers[0] == 0
    assert len(boxes) == 1 + 4 and set(layers[1:]) == {1}


def test_nms_prefers_high_scores():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.5, 0.9, 0.7])
    keep = batched_nms(boxes, scores, np.zeros(3, np.int64), 0.5)
    assert set(keep.tolist()) == {1, 2}


def test_remove_small_regions_and_uncrop():
    m = np.zeros((20, 20), bool)
    m[2:12, 2:12] = True
    m[5, 5] = False  # 1-px hole
    m[18, 18] = True  # 1-px island
    fixed, changed = remove_small_regions(m, area_thresh=4, mode="holes")
    assert changed and fixed[5, 5]
    fixed2, changed2 = remove_small_regions(fixed, 4, "islands")
    assert changed2 and not fixed2[18, 18]

    u = uncrop_masks(m[None], [5, 3, 25, 23], 30, 40)
    assert u.shape == (1, 30, 40)
    assert u[0, 2 + 3, 2 + 5] == m[2, 2]


def test_nms_matches_naive_greedy_reference():
    """Vectorized-suppression NMS == textbook per-box greedy NMS."""
    rng = np.random.default_rng(0)
    n = 400
    xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    wh = rng.uniform(1, 30, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(size=n).astype(np.float32)
    idxs = rng.integers(0, 3, n)

    def naive(boxes, scores, idxs, thr):
        off = idxs.astype(np.float32)[:, None] * (boxes.max() + 1)
        b = boxes + off
        order = np.argsort(-scores, kind="stable")
        x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        areas = np.maximum(0, x1 - x0) * np.maximum(0, y1 - y0)
        dead = np.zeros(len(b), bool)
        keep = []
        for i in order:
            if dead[i]:
                continue
            keep.append(i)
            ix0, iy0 = np.maximum(x0[i], x0), np.maximum(y0[i], y0)
            ix1, iy1 = np.minimum(x1[i], x1), np.minimum(y1[i], y1)
            inter = np.maximum(0, ix1 - ix0) * np.maximum(0, iy1 - iy0)
            iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
            dead |= iou > thr
            dead[i] = True
        return np.asarray(keep, np.int64)

    for thr in (0.3, 0.5, 0.8):
        got = batched_nms(boxes, scores, idxs, thr)
        want = naive(boxes, scores, idxs, thr)
        np.testing.assert_array_equal(got, want)


def test_remove_small_regions_threshold_is_exclusive():
    """areas >= area_thresh survive; bincount path must keep the same
    strict-inequality semantics as the old per-component probe."""
    m = np.zeros((16, 16), bool)
    m[0:2, 0:2] = True   # island of exactly 4 px
    m[8, 8] = True       # island of 1 px
    fixed, changed = remove_small_regions(m, area_thresh=4, mode="islands")
    assert changed
    assert fixed[0:2, 0:2].all()  # 4 >= 4 kept
    assert not fixed[8, 8]        # 1 < 4 removed
