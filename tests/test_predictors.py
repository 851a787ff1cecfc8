"""Smoke/behavior tests for SAM2 predictors with a tiny model."""

import numpy as np
import pytest

from sam2unet_tpu.configs import HIERA_TEST
from sam2unet_tpu.models.sam2_base import SAM2Config

TINY_SAM2 = SAM2Config(
    image_size=64,
    hidden_dim=64,
    mem_dim=16,
    max_obj_ptrs_in_encoder=4,
)


@pytest.fixture(scope="module")
def tiny_sam2():
    from sam2unet_tpu.build_sam import build_sam2

    model, variables = build_sam2(
        "hiera_test", sam2_config=TINY_SAM2, trunk_cfg=HIERA_TEST
    )
    return model, variables


def test_image_predictor_point_box_mask(tiny_sam2):
    from sam2unet_tpu.predictors.image_predictor import SAM2ImagePredictor

    model, variables = tiny_sam2
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(0)
    image = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    pred.set_image(image)

    masks, ious, low = pred.predict(
        point_coords=np.array([[20.0, 25.0]]), point_labels=np.array([1]),
        multimask_output=True,
    )
    assert masks.shape == (3, 48, 56) and masks.dtype == bool
    assert ious.shape == (3,)
    assert low.shape == (3, 16, 16)

    masks_b, ious_b, low_b = pred.predict(
        box=np.array([5.0, 5.0, 40.0, 40.0]), multimask_output=False,
    )
    assert masks_b.shape == (1, 48, 56)

    # mask-input refinement round trip
    masks2, _, _ = pred.predict(
        point_coords=np.array([[20.0, 25.0]]), point_labels=np.array([1]),
        mask_input=low[np.argmax(ious)][None],
        multimask_output=False,
    )
    assert masks2.shape == (1, 48, 56)


def test_image_predictor_batch(tiny_sam2):
    from sam2unet_tpu.predictors.image_predictor import SAM2ImagePredictor

    model, variables = tiny_sam2
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(1)
    imgs = [(rng.random((32, 40, 3)) * 255).astype(np.uint8) for _ in range(2)]
    pred.set_image_batch(imgs)
    masks, ious, lows = pred.predict_batch(
        point_coords_batch=[np.array([[10.0, 10.0]]), np.array([[20.0, 15.0]])],
        point_labels_batch=[np.array([1]), np.array([1])],
        multimask_output=True,
    )
    assert len(masks) == 2 and masks[0].shape == (3, 32, 40)


def test_video_predictor_propagation(tiny_sam2):
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    pred = SAM2VideoPredictor(model, variables)
    rng = np.random.default_rng(2)
    frames = (rng.random((4, 40, 48, 3)) * 255).astype(np.uint8)
    state = pred.init_state(images=frames)
    assert state["num_frames"] == 4

    fidx, obj_ids, masks = pred.add_new_points(
        state, frame_idx=0, obj_id=1,
        points=np.array([[24.0, 20.0]]), labels=np.array([1]),
    )
    assert fidx == 0 and obj_ids == [1]
    assert masks.shape == (1, 1, 40, 48)

    outputs = {}
    for frame_idx, ids, video_masks in pred.propagate_in_video(state):
        outputs[frame_idx] = np.asarray(video_masks)
    assert sorted(outputs) == [0, 1, 2, 3]
    assert outputs[2].shape == (1, 1, 40, 48)
    assert np.isfinite(outputs[3]).all()


def test_video_predictor_fixed_memory_signature(tiny_sam2):
    """The padded memory bank gives ONE jit signature for every propagated
    frame (no per-frame recompiles while the bank grows 1 -> num_maskmem
    grids) — the steady-state fix for the remote-compile warm-up cliff."""
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    pred = SAM2VideoPredictor(model, variables, device_resident=False)
    seen = []
    orig = pred._jit_track

    def spy(v, f, p, mem, mem_pos, valid, nptr, *rest, **kw):
        if mem is not None:
            seen.append((tuple(mem.shape), tuple(valid.shape), nptr))
        return orig(v, f, p, mem, mem_pos, valid, nptr, *rest, **kw)

    pred._jit_track = spy
    rng = np.random.default_rng(3)
    frames = (rng.random((10, 40, 48, 3)) * 255).astype(np.uint8)
    state = pred.init_state(images=frames)
    pred.add_new_points(
        state, frame_idx=0, obj_id=1,
        points=np.array([[24.0, 20.0]]), labels=np.array([1]),
    )
    list(pred.propagate_in_video(state))

    assert len(seen) == 9         # frames 1..9; frame 0 is the init cond
    assert len(set(seen)) == 1    # one signature -> one compiled program
    cfg = model.cfg
    hw = (cfg.image_size // 16) ** 2
    split = cfg.hidden_dim // cfg.mem_dim
    expected_tokens = cfg.num_maskmem * hw + cfg.max_obj_ptrs_in_encoder * split
    assert seen[0][0][1] == expected_tokens
    assert seen[0][2] == cfg.max_obj_ptrs_in_encoder * split


def test_video_device_bank_matches_host_gather_path(tiny_sam2):
    """The device-resident steady state (fixed-shape device bank, single
    jitted step, no host gather) must reproduce the host-gathered legacy
    path: same per-frame video-res masks within float tolerance, and the
    memory bytes must never cross to the host during propagation."""
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    rng = np.random.default_rng(7)
    frames = (rng.random((6, 40, 48, 3)) * 255).astype(np.uint8)

    outs = {}
    for name, dev in (("legacy", False), ("device", True)):
        pred = SAM2VideoPredictor(model, variables, device_resident=dev)
        if dev:
            calls = {"gather": 0, "step": 0}
            orig_gather = pred._gather_memory
            pred._gather_memory = lambda *a, **k: (
                calls.__setitem__("gather", calls["gather"] + 1)
                or orig_gather(*a, **k)
            )
        state = pred.init_state(images=frames)
        pred.add_new_points(
            state, frame_idx=0, obj_id=1,
            points=np.array([[24.0, 20.0]]), labels=np.array([1]),
        )
        outs[name] = {
            f: np.asarray(m, np.float32)
            for f, _, m in pred.propagate_in_video(state)
        }
        # reverse re-track from mid-video: frame 3 needs frame 4's memory,
        # which on the device path must be lazily seeded into the ring from
        # the forward pass's stored outputs
        outs[name].update({
            (f, "rev"): np.asarray(m, np.float32)
            for f, _, m in pred.propagate_in_video(
                state, start_frame_idx=4, reverse=True
            )
        })
        if dev:
            assert calls["gather"] == 0  # no host memory gather anywhere

    assert set(outs["legacy"]) == set(outs["device"])
    for f in outs["legacy"]:
        np.testing.assert_allclose(
            outs["device"][f], outs["legacy"][f], rtol=1e-4, atol=2e-4,
            err_msg=f"frame {f}",
        )


def test_prompt_assembly_reference_semantics():
    """The reference merges boxes into corner points and calls the prompt
    encoder with boxes=None, so the (-1) pad point is ALWAYS appended —
    including for box prompts (sam2_image_predictor.py:380-388,
    prompt_encoder.py:169) — and no-prompt calls produce ZERO sparse
    tokens, not a lone pad token."""
    from sam2unet_tpu.predictors.image_predictor import _assemble_prompts

    box = np.array([[10.0, 20.0], [30.0, 40.0]])
    c, l = _assemble_prompts(box, None, None)
    assert l.tolist() == [[2, 3, -1]] and c.shape == (1, 3, 2)
    assert np.all(c[0, 2] == 0)

    c, l = _assemble_prompts(box, np.array([[5.0, 6.0]]), np.array([1]))
    assert l.tolist() == [[2, 3, 1, -1]]

    c, l = _assemble_prompts(None, np.array([[5.0, 6.0]]), np.array([1]))
    assert l.tolist() == [[1, -1]]

    c, l = _assemble_prompts(None, None, None)
    assert c.shape == (1, 0, 2) and l.shape == (1, 0)


def test_mask_only_prompt_runs(tiny_sam2):
    """Prompting with a mask alone (no points/box) is a reference-supported
    combination (concat_points=None); it must run with zero sparse tokens."""
    from sam2unet_tpu.predictors.image_predictor import SAM2ImagePredictor

    model, variables = tiny_sam2
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(6)
    pred.set_image((rng.random((48, 56, 3)) * 255).astype(np.uint8))
    _, ious, low = pred.predict(
        point_coords=np.array([[20.0, 25.0]]), point_labels=np.array([1]),
        multimask_output=True,
    )
    best = low[np.argmax(ious)][None]
    masks, _, _ = pred.predict(mask_input=best, multimask_output=False)
    assert masks.shape == (1, 48, 56)
    # batched low-level path, mask-only
    m2, _, _ = pred._predict(None, None, mask_input=best[None],
                             multimask_output=False)
    assert m2.shape[0] == 1


def test_pred_obj_scores_without_encoder_ptrs_runs():
    """pred_obj_scores=True + use_obj_ptrs_in_encoder=False crashes the
    torch reference (no_obj_ptr is only created under both flags yet read
    under pred_obj_scores alone, sam2_base.py:169-170 vs :390-399); here
    the param is created whenever it can be read."""
    from sam2unet_tpu.build_sam import build_sam2
    from sam2unet_tpu.predictors.image_predictor import SAM2ImagePredictor

    cfg = SAM2Config(
        image_size=64, hidden_dim=64, mem_dim=16,
        pred_obj_scores=True, pred_obj_scores_mlp=True,
        use_obj_ptrs_in_encoder=False,
    )
    model, variables = build_sam2("hiera_test", sam2_config=cfg,
                                  trunk_cfg=HIERA_TEST)
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(4)
    pred.set_image((rng.random((48, 56, 3)) * 255).astype(np.uint8))
    masks, ious, _ = pred.predict(
        point_coords=np.array([[20.0, 25.0]]), point_labels=np.array([1]),
        multimask_output=True,
    )
    assert masks.shape == (3, 48, 56)


def test_video_without_directly_add_no_mem_embed():
    """directly_add_no_mem_embed=False routes the first conditioning frame
    through memory attention with no-memory tokens; those tokens must be
    mem_dim-wide (the reference's expand() fallback only type-checks when
    mem_dim == hidden_dim, sam2_base.py:646-647)."""
    from sam2unet_tpu.build_sam import build_sam2
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    cfg = SAM2Config(
        image_size=64, hidden_dim=64, mem_dim=16,
        max_obj_ptrs_in_encoder=4, directly_add_no_mem_embed=False,
    )
    model, variables = build_sam2("hiera_test", sam2_config=cfg,
                                  trunk_cfg=HIERA_TEST)
    pred = SAM2VideoPredictor(model, variables)
    rng = np.random.default_rng(5)
    frames = (rng.random((3, 40, 48, 3)) * 255).astype(np.uint8)
    state = pred.init_state(images=frames)
    pred.add_new_points(
        state, frame_idx=0, obj_id=1,
        points=np.array([[24.0, 20.0]]), labels=np.array([1]),
    )
    outs = {f: np.asarray(m) for f, _, m in pred.propagate_in_video(state)}
    assert len(outs) == 3


def test_video_pointer_overflow_two_cond_frames(tiny_sam2):
    """With >1 cond frame on a long-enough video, the reference attends to
    EVERY selected cond pointer PLUS up to max_obj_ptrs_in_encoder - 1
    non-cond pointers (sam2_base.py:570-620) — more than a flat
    max_obj_ptrs_in_encoder slot count. Regression: the host pad width went
    negative (ValueError) and the device path silently truncated. Both
    paths must run and agree (tiny config: max_obj_ptrs=4; 2 prompts + 3
    tracked predecessors = 5 pointers at the late frames)."""
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    rng = np.random.default_rng(12)
    frames = (rng.random((8, 40, 48, 3)) * 255).astype(np.uint8)

    outs = {}
    for name, dev in (("legacy", False), ("device", True)):
        pred = SAM2VideoPredictor(model, variables, device_resident=dev)
        state = pred.init_state(images=frames)
        for fidx in (0, 2):
            pred.add_new_points(
                state, frame_idx=fidx, obj_id=1,
                points=np.array([[24.0, 20.0]]), labels=np.array([1]),
            )
        outs[name] = {
            f: np.asarray(m, np.float32)
            for f, _, m in pred.propagate_in_video(state)
        }

    assert set(outs["legacy"]) == set(outs["device"])
    for f in outs["legacy"]:
        np.testing.assert_allclose(
            outs["device"][f], outs["legacy"][f], rtol=1e-4, atol=2e-4,
            err_msg=f"frame {f}",
        )


def test_repropagation_retracks_instead_of_serving_cache(tiny_sam2):
    """Only frames with fresh inputs are served from cache on propagation
    (reference consolidated_frame_inds semantics): a second propagate call
    must RE-TRACK every non-input frame — an earlier bug marked all
    tracked frames consolidated, so corrections never propagated."""
    from unittest import mock

    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    rng = np.random.default_rng(13)
    frames = (rng.random((4, 40, 48, 3)) * 255).astype(np.uint8)
    pred = SAM2VideoPredictor(model, variables, device_resident=False)
    state = pred.init_state(images=frames)
    pred.add_new_points(
        state, frame_idx=0, obj_id=1,
        points=np.array([[24.0, 20.0]]), labels=np.array([1]),
    )
    list(pred.propagate_in_video(state))

    calls = {"n": 0}
    orig = pred._run_single_frame_inference

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    with mock.patch.object(pred, "_run_single_frame_inference", spy):
        list(pred.propagate_in_video(state))
    # 4 frames, 1 input frame -> 3 re-tracked (not 0 = stale cache)
    assert calls["n"] == 3, calls


def test_video_packed_mask_yield_matches_float(tiny_sam2):
    """yield_packed_masks=True returns bit-packed (mask > 0) along width;
    np.unpackbits must reproduce the float path's binarization."""
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    rng = np.random.default_rng(8)
    frames = (rng.random((3, 40, 48, 3)) * 255).astype(np.uint8)

    def run(**kw):
        pred = SAM2VideoPredictor(model, variables)
        state = pred.init_state(images=frames)
        pred.add_new_points(
            state, frame_idx=0, obj_id=1,
            points=np.array([[24.0, 20.0]]), labels=np.array([1]),
        )
        return {f: np.asarray(m) for f, _, m in
                pred.propagate_in_video(state, **kw)}

    dense = run()
    packed = run(yield_packed_masks=True)
    for f in dense:
        want = dense[f] > 0
        got = np.unpackbits(packed[f], axis=-1)[..., : want.shape[-1]]
        np.testing.assert_array_equal(got.astype(bool), want, err_msg=str(f))


def test_video_predictor_mask_input_and_multi_object(tiny_sam2):
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    pred = SAM2VideoPredictor(model, variables)
    rng = np.random.default_rng(3)
    frames = (rng.random((3, 40, 48, 3)) * 255).astype(np.uint8)
    state = pred.init_state(images=frames)

    mask = np.zeros((40, 48), np.uint8)
    mask[10:25, 10:30] = 1
    pred.add_new_mask(state, frame_idx=0, obj_id=7, mask=mask)
    pred.add_new_points(
        state, frame_idx=0, obj_id=8,
        points=np.array([[40.0, 35.0]]), labels=np.array([1]),
    )
    results = list(pred.propagate_in_video(state))
    assert len(results) == 3
    _, ids, masks = results[-1]
    assert ids == [7, 8]
    assert masks.shape == (2, 1, 40, 48)


def test_predict_amg_matches_host_path(tiny_sam2):
    """The device AMG fast path (_predict_amg: stability + threshold +
    bit-pack in the decode jit) must reproduce the host path exactly."""
    from sam2unet_tpu.predictors.image_predictor import SAM2ImagePredictor
    from sam2unet_tpu.utils.amg import calculate_stability_score

    model, variables = tiny_sam2
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(5)
    image = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    pred.set_image(image)
    pts = np.array([[[10.0, 12.0]], [[30.0, 20.0]], [[44.0, 36.0]]],
                   np.float32)
    labels = np.ones((3, 1), np.int32)

    masks_d, ious_d, _, stab_d = pred._predict_amg(
        pts, labels, multimask_output=True, stability_offset=1.0
    )
    logits, ious_h, _ = pred._predict(
        pts, labels, multimask_output=True, return_logits=True
    )
    stab_h = calculate_stability_score(logits, pred.mask_threshold, 1.0)

    assert masks_d.dtype == np.bool_
    np.testing.assert_array_equal(masks_d, logits > pred.mask_threshold)
    np.testing.assert_allclose(ious_d, ious_h, rtol=1e-6)
    np.testing.assert_allclose(stab_d, stab_h, rtol=1e-5)

    # a generator-level mask_threshold overrides the predictor's default on
    # the device path (automatic_mask_generator.py:45,140 keeps them separate)
    thr = 0.25
    masks_t, _, _, stab_t = pred._predict_amg(
        pts, labels, multimask_output=True, stability_offset=1.0,
        mask_threshold=thr,
    )
    np.testing.assert_array_equal(masks_t, logits > thr)
    np.testing.assert_allclose(
        stab_t, calculate_stability_score(logits, thr, 1.0), rtol=1e-5
    )


def test_amg_generates_records(tiny_sam2):
    from sam2unet_tpu.predictors.amg import SAM2AutomaticMaskGenerator

    model, variables = tiny_sam2
    amg = SAM2AutomaticMaskGenerator(
        model, variables, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
    )
    rng = np.random.default_rng(4)
    image = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    records = amg.generate(image)
    assert isinstance(records, list)
    if records:  # random weights may filter everything via NMS only
        r = records[0]
        assert set(r) >= {"segmentation", "area", "bbox", "predicted_iou",
                          "point_coords", "stability_score", "crop_box"}
        assert r["segmentation"].shape == (40, 40)
        # reference emits integer boxes (torch int64 through xyxy_to_xywh)
        assert all(isinstance(v, int) for v in r["bbox"] + r["crop_box"])


def test_video_device_bank_interactive_correction_and_clearing(tiny_sam2):
    """Re-prompting mid-video after propagation (cond count grows -> the
    device bank reshapes) and clear_non_cond_mem_around_input (entries
    vanish from output_dict -> bank validity must follow) both keep the
    device path running and matching the legacy path."""
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    model, variables = tiny_sam2
    rng = np.random.default_rng(11)
    frames = (rng.random((6, 40, 48, 3)) * 255).astype(np.uint8)

    outs = {}
    for name, dev in (("legacy", False), ("device", True)):
        pred = SAM2VideoPredictor(
            model, variables, device_resident=dev,
            clear_non_cond_mem_around_input=True,
        )
        state = pred.init_state(images=frames)
        pred.add_new_points(
            state, frame_idx=0, obj_id=1,
            points=np.array([[24.0, 20.0]]), labels=np.array([1]),
        )
        list(pred.propagate_in_video(state))
        # correction on frame 3 -> second cond frame; nearby non-cond
        # memories are cleared in preflight
        pred.add_new_points(
            state, frame_idx=3, obj_id=1,
            points=np.array([[30.0, 22.0]]), labels=np.array([1]),
        )
        outs[name] = {
            f: np.asarray(m, np.float32)
            for f, _, m in pred.propagate_in_video(state)
        }

    assert set(outs["legacy"]) == set(outs["device"]) == {0, 1, 2, 3, 4, 5}
    for f in outs["legacy"]:
        np.testing.assert_allclose(
            outs["device"][f], outs["legacy"][f], rtol=1e-4, atol=2e-4,
            err_msg=f"frame {f}",
        )
