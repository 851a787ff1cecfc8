"""SAM2 video predictor: interactive multi-object streaming tracker.

API-compatible re-design of sam2/sam2_video_predictor.py:17-898. The host
owns the state machine (per-object prompt dicts, cond/non-cond output
banks, memory selection — all irregular Python); the device owns the hot
state. Two execution paths:

1. Steady-state propagation (device_resident=True, the default): the
   memory bank lives in fixed-shape DEVICE arrays (predictors/
   video_device.py) — a cond bank uploaded once per pass plus ring buffers
   updated in place by ONE jitted program per frame (uint8 frame upload ->
   device preprocess -> image encoder -> memory attention over the bank ->
   SAM heads -> memory encoder -> ring update -> video-res masks). The
   host computes only gather indices/validity bits per frame; memory bytes
   never cross the link.
2. Interactive prompting and the device_resident=False fallback: the
   memory bank is gathered host-side, PADDED to fixed slot counts
   (num_maskmem grids + max_obj_ptrs pointer tokens, invalid tokens
   masked out of the cross-attention softmax), so a single compiled
   program serves every frame — no per-frame recompile warm-up.

Frames live host-side as numpy; features are cached per frame like the
reference's `cached_features`.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

def _sine_pe_np(pos: np.ndarray, dim: int,
                temperature: float = 10000.0) -> np.ndarray:
    """Host-numpy twin of get_1d_sine_pe (sam2_utils.py:60-70) for the
    host-gather path: tiny per-frame positional tables should not cost a
    device dispatch + readback each."""
    pe_dim = dim // 2
    dim_t = np.arange(pe_dim, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos = np.asarray(pos, np.float32)[..., None] / dim_t
    return np.concatenate([np.sin(pos), np.cos(pos)], axis=-1).astype(
        np.float32
    )
from sam2unet_tpu.models.sam2_base import SAM2Base
from sam2unet_tpu.predictors.transforms import SAM2Transforms

NO_OBJ_SCORE = -1024.0


def select_closest_cond_frames(frame_idx, cond_frame_outputs, max_cond_frame_num):
    """(sam2_utils.py:15-57)."""
    if max_cond_frame_num == -1 or len(cond_frame_outputs) <= max_cond_frame_num:
        return cond_frame_outputs, {}
    assert max_cond_frame_num >= 2
    selected = {}
    idx_before = max((t for t in cond_frame_outputs if t < frame_idx), default=None)
    if idx_before is not None:
        selected[idx_before] = cond_frame_outputs[idx_before]
    idx_after = min((t for t in cond_frame_outputs if t >= frame_idx), default=None)
    if idx_after is not None:
        selected[idx_after] = cond_frame_outputs[idx_after]
    remain = sorted(
        (t for t in cond_frame_outputs if t not in selected),
        key=lambda x: abs(x - frame_idx),
    )[: max_cond_frame_num - len(selected)]
    selected.update((t, cond_frame_outputs[t]) for t in remain)
    unselected = {t: v for t, v in cond_frame_outputs.items() if t not in selected}
    return selected, unselected


class SAM2VideoPredictor:
    def __init__(
        self,
        model: SAM2Base,
        variables: dict,
        fill_hole_area: int = 0,
        non_overlap_masks: bool = False,
        clear_non_cond_mem_around_input: bool = False,
        clear_non_cond_mem_for_multi_obj: bool = False,
        device_resident: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.cfg = model.cfg
        self.fill_hole_area = fill_hole_area
        self.non_overlap_masks = non_overlap_masks
        self.clear_non_cond_mem_around_input = clear_non_cond_mem_around_input
        self.clear_non_cond_mem_for_multi_obj = clear_non_cond_mem_for_multi_obj
        # device-resident steady state: memory bank in fixed-shape device
        # arrays, ONE jitted program per propagated frame (predictors/
        # video_device.py). False falls back to the host-gathered bank.
        self.device_resident = device_resident and self.cfg.num_maskmem > 0
        self._device_step = None
        # host copies of constant params read by the host-gather path —
        # re-reading them from device every frame paid a tunnel round trip
        # per frame for weights that never change
        self._host_params: dict[tuple, np.ndarray] = {}
        self._transforms = SAM2Transforms(resolution=self.cfg.image_size,
                                          mask_threshold=0.0)

        m = model
        self._jit_forward_image = jax.jit(
            lambda v, x: m.apply(v, x, method=SAM2Base.forward_image)
        )
        self._jit_mask_as_output = jax.jit(
            lambda v, bf, hr0, hr1, mi: m.apply(
                v, bf, (hr0, hr1), mi, method=SAM2Base.use_mask_as_output
            )
        )
        self._jit_encode_memory = jax.jit(
            lambda v, f, masks, from_pts: m.apply(
                v, f, masks, from_pts, method=SAM2Base.encode_new_memory
            ),
            static_argnames=("from_pts",),
        )

        # whole tracked-frame program: memory conditioning + SAM heads
        # [+ memory encoding] in ONE dispatch — the per-frame hot path is
        # otherwise 3 device calls whose launch latency dominates streaming
        # (reference runs everything in one eager graph per frame,
        # sam2_base.py:704-799)
        def track(v, f, p, mem, mem_pos, valid, nptr, c, l, mi, hr0, hr1,
                  multi, encode, from_pts):
            def run(mm: SAM2Base):
                if mem is None:
                    pix = mm.condition_features_on_memory(f, p, None, None,
                                                          0, True)
                else:
                    pix = mm.condition_features_on_memory(
                        f, p, mem, mem_pos, nptr, memory_valid=valid
                    )
                outs = mm.forward_sam_heads(pix, c, l, mi, (hr0, hr1), multi)
                if not encode:
                    return outs, None, None
                high_res_masks = outs[4]
                feats, penc = mm.encode_new_memory(f, high_res_masks,
                                                   from_pts)
                return outs, feats, penc

            return m.apply(v, method=run)

        self._jit_track = jax.jit(
            track, static_argnames=("nptr", "multi", "encode", "from_pts")
        )

    # -------------------------------------------------------------- state

    def init_state(
        self,
        video_path: str | None = None,
        images: np.ndarray | None = None,
        offload_video_to_cpu: bool = False,
        offload_state_to_cpu: bool = False,
        async_loading_frames: bool = False,
    ) -> dict:
        """images: (T, H, W, 3) RGB uint8, or video_path: directory of
        frame JPEG/PNGs (misc.py:163-213 contract).

        offload_video_to_cpu: accepted for API parity but always
        effectively True here — frames live host-side as numpy and are
        uploaded per tracked frame (the device-resident design keeps the
        *memory bank*, not the video, in HBM).
        offload_state_to_cpu: real on the device-resident path — per-frame
        outputs (mask memory, low-res masks, pointers) are pulled to host
        numpy eagerly instead of accumulating as device arrays (the
        reference's storage_device=cpu, sam2_video_predictor.py:801-813;
        trades HBM growth for per-frame readback).
        async_loading_frames: with a video_path, return after decoding the
        first frame and prefetch the rest on a thread (misc.py:104-160);
        frame access blocks until the frame is decoded."""
        if images is None:
            if async_loading_frames:
                from sam2unet_tpu.utils.video import AsyncVideoFrameLoader

                images = AsyncVideoFrameLoader(video_path)
                orig_h, orig_w = images.video_height, images.video_width
            else:
                from sam2unet_tpu.utils.video import load_video_frames

                images, orig_h, orig_w = load_video_frames(video_path)
        else:
            orig_h, orig_w = images.shape[1:3]
        state = {
            "images": images,  # raw host frames (uint8) — lazy per-frame prep
            "num_frames": len(images),
            "offload_video_to_cpu": offload_video_to_cpu,
            "offload_state_to_cpu": offload_state_to_cpu,
            "video_height": orig_h,
            "video_width": orig_w,
            "point_inputs_per_obj": {},
            "mask_inputs_per_obj": {},
            "cached_features": {},
            "constants": {},
            "obj_id_to_idx": OrderedDict(),
            "obj_idx_to_id": OrderedDict(),
            "obj_ids": [],
            "output_dict": {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}},
            "output_dict_per_obj": {},
            "temp_output_dict_per_obj": {},
            "consolidated_frame_inds": {
                "cond_frame_outputs": set(),
                "non_cond_frame_outputs": set(),
            },
            "tracking_has_started": False,
            "frames_already_tracked": {},
        }
        self._get_image_feature(state, frame_idx=0, batch_size=1)  # warm up
        return state

    def reset_state(self, state: dict) -> None:
        self._reset_tracking_results(state)
        state["obj_id_to_idx"].clear()
        state["obj_idx_to_id"].clear()
        state["obj_ids"].clear()
        state["point_inputs_per_obj"].clear()
        state["mask_inputs_per_obj"].clear()
        state["output_dict_per_obj"].clear()
        state["temp_output_dict_per_obj"].clear()

    def _reset_tracking_results(self, state: dict) -> None:
        for v in state["point_inputs_per_obj"].values():
            v.clear()
        for v in state["mask_inputs_per_obj"].values():
            v.clear()
        for v in state["output_dict_per_obj"].values():
            v["cond_frame_outputs"].clear()
            v["non_cond_frame_outputs"].clear()
        for v in state["temp_output_dict_per_obj"].values():
            v["cond_frame_outputs"].clear()
            v["non_cond_frame_outputs"].clear()
        state["output_dict"]["cond_frame_outputs"].clear()
        state["output_dict"]["non_cond_frame_outputs"].clear()
        state["consolidated_frame_inds"]["cond_frame_outputs"].clear()
        state["consolidated_frame_inds"]["non_cond_frame_outputs"].clear()
        state["tracking_has_started"] = False
        state["frames_already_tracked"].clear()

    def _obj_id_to_idx(self, state: dict, obj_id: int) -> int:
        """(sam2_video_predictor.py:106-146)."""
        obj_idx = state["obj_id_to_idx"].get(obj_id, None)
        if obj_idx is not None:
            return obj_idx
        if state["tracking_has_started"]:
            raise RuntimeError(
                "Cannot add new object id after tracking starts; call "
                "reset_state to restart."
            )
        obj_idx = len(state["obj_id_to_idx"])
        state["obj_id_to_idx"][obj_id] = obj_idx
        state["obj_idx_to_id"][obj_idx] = obj_id
        state["obj_ids"] = list(state["obj_id_to_idx"])
        state["point_inputs_per_obj"][obj_idx] = {}
        state["mask_inputs_per_obj"][obj_idx] = {}
        state["output_dict_per_obj"][obj_idx] = {
            "cond_frame_outputs": {},
            "non_cond_frame_outputs": {},
        }
        state["temp_output_dict_per_obj"][obj_idx] = {
            "cond_frame_outputs": {},
            "non_cond_frame_outputs": {},
        }
        return obj_idx

    # ------------------------------------------------------------- inputs

    def add_new_points(
        self,
        inference_state: dict,
        frame_idx: int,
        obj_id: int,
        points,
        labels,
        clear_old_points: bool = True,
        normalize_coords: bool = True,
    ):
        """(sam2_video_predictor.py:148-255)."""
        state = inference_state
        obj_idx = self._obj_id_to_idx(state, obj_id)
        points = np.asarray(points, np.float32)
        labels = np.asarray(labels, np.int32)
        if points.ndim == 2:
            points = points[None]
        if labels.ndim == 1:
            labels = labels[None]
        if normalize_coords:
            points = points / np.asarray(
                [state["video_width"], state["video_height"]], np.float32
            )
        points = points * self.cfg.image_size

        if not clear_old_points:
            old = state["point_inputs_per_obj"][obj_idx].get(frame_idx)
            if old is not None:
                points = np.concatenate([old["point_coords"], points], axis=1)
                labels = np.concatenate([old["point_labels"], labels], axis=1)
        point_inputs = {"point_coords": points, "point_labels": labels}
        state["point_inputs_per_obj"][obj_idx][frame_idx] = point_inputs
        state["mask_inputs_per_obj"][obj_idx].pop(frame_idx, None)

        is_init_cond_frame = frame_idx not in state["frames_already_tracked"]
        if is_init_cond_frame:
            reverse = False
        else:
            reverse = state["frames_already_tracked"][frame_idx]["reverse"]
        obj_output_dict = state["output_dict_per_obj"][obj_idx]
        obj_temp = state["temp_output_dict_per_obj"][obj_idx]
        is_cond = is_init_cond_frame or self.cfg.add_all_frames_to_correct_as_cond
        storage_key = "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"

        prev_sam_mask_logits = None
        prev_out = obj_temp[storage_key].get(frame_idx)
        if prev_out is None:
            prev_out = obj_output_dict["cond_frame_outputs"].get(frame_idx)
            if prev_out is None:
                prev_out = obj_output_dict["non_cond_frame_outputs"].get(frame_idx)
        if prev_out is not None and prev_out.get("pred_masks") is not None:
            prev_sam_mask_logits = np.clip(prev_out["pred_masks"], -32.0, 32.0)

        current_out = self._run_single_frame_inference(
            state,
            output_dict=obj_output_dict,
            frame_idx=frame_idx,
            batch_size=1,
            is_init_cond_frame=is_init_cond_frame,
            point_inputs=point_inputs,
            mask_inputs=None,
            reverse=reverse,
            run_mem_encoder=False,
            prev_sam_mask_logits=prev_sam_mask_logits,
        )
        obj_temp[storage_key][frame_idx] = current_out

        obj_ids = state["obj_ids"]
        consolidated = self._consolidate_temp_output_across_obj(
            state, frame_idx, is_cond=is_cond, run_mem_encoder=False,
            consolidate_at_video_res=True,
        )
        _, video_res_masks = self._get_orig_video_res_output(
            state, consolidated["pred_masks_video_res"]
        )
        return frame_idx, obj_ids, video_res_masks

    add_new_points_or_box = add_new_points

    def add_new_mask(self, inference_state: dict, frame_idx: int, obj_id: int, mask):
        """(sam2_video_predictor.py:257-336). mask: (H, W) bool/0-1."""
        state = inference_state
        obj_idx = self._obj_id_to_idx(state, obj_id)
        mask = np.asarray(mask)
        assert mask.ndim == 2
        mh, mw = mask.shape
        mask_f = mask.astype(np.float32)[None, None]  # (1,1,H,W)
        if (mh, mw) != (self.cfg.image_size, self.cfg.image_size):
            from sam2unet_tpu.ops.resize_np import resize_np

            mask_f = resize_np(
                mask_f, (self.cfg.image_size, self.cfg.image_size), "bilinear",
                antialias=True,
            )
            mask_f = (mask_f >= 0.5).astype(np.float32)
        state["mask_inputs_per_obj"][obj_idx][frame_idx] = mask_f
        state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)

        is_init_cond_frame = frame_idx not in state["frames_already_tracked"]
        reverse = (
            False
            if is_init_cond_frame
            else state["frames_already_tracked"][frame_idx]["reverse"]
        )
        obj_output_dict = state["output_dict_per_obj"][obj_idx]
        obj_temp = state["temp_output_dict_per_obj"][obj_idx]
        is_cond = is_init_cond_frame or self.cfg.add_all_frames_to_correct_as_cond
        storage_key = "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"

        current_out = self._run_single_frame_inference(
            state,
            output_dict=obj_output_dict,
            frame_idx=frame_idx,
            batch_size=1,
            is_init_cond_frame=is_init_cond_frame,
            point_inputs=None,
            mask_inputs=mask_f,
            reverse=reverse,
            run_mem_encoder=False,
        )
        obj_temp[storage_key][frame_idx] = current_out

        consolidated = self._consolidate_temp_output_across_obj(
            state, frame_idx, is_cond=is_cond, run_mem_encoder=False,
            consolidate_at_video_res=True,
        )
        _, video_res_masks = self._get_orig_video_res_output(
            state, consolidated["pred_masks_video_res"]
        )
        return frame_idx, state["obj_ids"], video_res_masks

    # ------------------------------------------------------------ outputs

    def _get_orig_video_res_output(self, state, any_res_masks):
        """(sam2_video_predictor.py:338-358): resize to original video res,
        optional non-overlap constraint."""
        from sam2unet_tpu.ops.resize_np import resize_np

        h, w = state["video_height"], state["video_width"]
        masks = np.asarray(any_res_masks, np.float32)
        if masks.shape[-2:] != (h, w):
            video_res = resize_np(masks, (h, w), "bilinear")
        else:
            video_res = masks
        if self.non_overlap_masks:
            video_res = np.asarray(
                SAM2Base.apply_non_overlapping_constraints(jnp.asarray(video_res))
            )
        return masks, video_res

    def _consolidate_temp_output_across_obj(
        self, state, frame_idx, is_cond, run_mem_encoder,
        consolidate_at_video_res=False,
    ):
        """(sam2_video_predictor.py:360-476): merge per-object temp outputs
        into a cross-object consolidated output on this frame."""
        batch_size = len(state["obj_idx_to_id"])
        storage_key = "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"
        if consolidate_at_video_res:
            # interactive return path (sam2_video_predictor.py:377-404):
            # merge each object's latest mask at ORIGINAL video resolution so
            # objects updated at different times/clicks compose crisply
            assert not run_mem_encoder, "video-res consolidation is UI-only"
            mh, mw = state["video_height"], state["video_width"]
            mask_key = "pred_masks_video_res"
        else:
            mh = mw = self.cfg.image_size // 4
            mask_key = "pred_masks"
        consolidated = {
            "maskmem_features": None,
            "maskmem_pos_enc": None,
            mask_key: np.full((batch_size, 1, mh, mw), NO_OBJ_SCORE, np.float32),
            "obj_ptr": np.full(
                (batch_size, self.cfg.hidden_dim), NO_OBJ_SCORE, np.float32
            ),
        }
        empty_mask_ptr = None
        for obj_idx in range(batch_size):
            obj_temp = state["temp_output_dict_per_obj"][obj_idx]
            out = obj_temp[storage_key].get(frame_idx)
            if out is None:
                out = state["output_dict_per_obj"][obj_idx][
                    "cond_frame_outputs"
                ].get(frame_idx)
            if out is None:
                out = state["output_dict_per_obj"][obj_idx][
                    "non_cond_frame_outputs"
                ].get(frame_idx)
            if out is None:
                # object has no output on this frame: when building memory,
                # fill its pointer from an empty-mask dummy prediction —
                # leaving the NO_OBJ_SCORE fill would inject a +-1024
                # garbage token into cross-attention
                # (sam2_video_predictor.py:426-438)
                if run_mem_encoder:
                    if empty_mask_ptr is None:
                        empty_mask_ptr = self._get_empty_mask_ptr(
                            state, frame_idx
                        )
                    consolidated["obj_ptr"][obj_idx : obj_idx + 1] = (
                        empty_mask_ptr
                    )
                continue
            masks = out["pred_masks"]
            if masks.shape[-2:] != (mh, mw):
                from sam2unet_tpu.ops.resize_np import resize_np

                masks = resize_np(
                    np.asarray(masks, np.float32), (mh, mw), "bilinear"
                )
            consolidated[mask_key][obj_idx : obj_idx + 1] = masks
            consolidated["obj_ptr"][obj_idx : obj_idx + 1] = out["obj_ptr"]

        if not consolidate_at_video_res:
            consolidated["pred_masks_video_res"] = consolidated["pred_masks"]

        if run_mem_encoder:
            from sam2unet_tpu.ops.resize_np import resize_np

            hi = resize_np(
                consolidated["pred_masks"],
                (self.cfg.image_size, self.cfg.image_size),
                "bilinear",
            )
            if self.cfg.non_overlap_masks_for_mem_enc:
                # gated on the config like the reference
                # (sam2_video_predictor.py:459,465) — NOT on multi-object
                hi = np.asarray(
                    SAM2Base.apply_non_overlapping_constraints(jnp.asarray(hi))
                )
            feats, pos = self._run_memory_encoder(
                state, frame_idx, batch_size, hi, is_mask_from_pts=True
            )
            consolidated["maskmem_features"] = feats
            consolidated["maskmem_pos_enc"] = pos
        return consolidated

    def _get_empty_mask_ptr(self, state, frame_idx: int) -> np.ndarray:
        """Dummy object pointer from an all-empty mask on this frame
        (sam2_video_predictor.py:479-512)."""
        cfg = self.cfg
        mask_inputs = np.zeros(
            (1, 1, cfg.image_size, cfg.image_size), np.float32
        )
        out = self._run_single_frame_inference(
            state,
            output_dict={},
            frame_idx=frame_idx,
            batch_size=1,
            is_init_cond_frame=True,
            point_inputs=None,
            mask_inputs=mask_inputs,
            reverse=False,
            run_mem_encoder=False,
        )
        return out["obj_ptr"]

    # ---------------------------------------------------------- main loop

    def propagate_in_video_preflight(self, state: dict):
        """(sam2_video_predictor.py:514-582)."""
        state["tracking_has_started"] = True
        batch_size = len(state["obj_idx_to_id"])
        assert batch_size > 0, "add inputs before propagation"

        temp_frame_inds = {"cond_frame_outputs": set(),
                           "non_cond_frame_outputs": set()}
        for obj_temp in state["temp_output_dict_per_obj"].values():
            temp_frame_inds["cond_frame_outputs"].update(
                obj_temp["cond_frame_outputs"]
            )
            temp_frame_inds["non_cond_frame_outputs"].update(
                obj_temp["non_cond_frame_outputs"]
            )

        for is_cond in (False, True):
            storage_key = (
                "cond_frame_outputs" if is_cond else "non_cond_frame_outputs"
            )
            # consolidated_frame_inds accumulates ONLY the input frames
            # (fresh clicks/masks): the propagation loop treats membership
            # as "serve the cached output" — marking every tracked frame
            # here (an earlier bug) made re-propagation after a correction
            # return stale pre-correction masks instead of re-tracking
            # (sam2_video_predictor.py:528-538).
            state["consolidated_frame_inds"][storage_key].update(
                temp_frame_inds[storage_key]
            )
            for frame_idx in sorted(temp_frame_inds[storage_key]):
                consolidated = self._consolidate_temp_output_across_obj(
                    state, frame_idx, is_cond=is_cond, run_mem_encoder=True
                )
                # clear the stale pre-correction neighborhood BEFORE
                # storing: the reference clears after, which pops a
                # non-cond input frame's own just-consolidated output and
                # crashes its propagation loop (KeyError) in the
                # correction-while-clearing workflow
                clear_non_cond = self.clear_non_cond_mem_around_input and (
                    self.clear_non_cond_mem_for_multi_obj or batch_size <= 1
                )
                if clear_non_cond:
                    self._clear_non_cond_mem_around_input(state, frame_idx)
                state["output_dict"][storage_key][frame_idx] = consolidated
                self._add_output_per_object(
                    state, frame_idx, consolidated, storage_key
                )
            for obj_temp in state["temp_output_dict_per_obj"].values():
                obj_temp[storage_key].clear()

        # cond frames override non-cond entries (incl. the consolidated
        # index, sam2_video_predictor.py:561-569)
        for frame_idx in state["output_dict"]["cond_frame_outputs"]:
            state["output_dict"]["non_cond_frame_outputs"].pop(frame_idx, None)
            for obj_out in state["output_dict_per_obj"].values():
                obj_out["non_cond_frame_outputs"].pop(frame_idx, None)
        for frame_idx in state["consolidated_frame_inds"]["cond_frame_outputs"]:
            state["consolidated_frame_inds"]["non_cond_frame_outputs"].discard(
                frame_idx
            )

    def propagate_in_video(
        self,
        inference_state: dict,
        start_frame_idx: int | None = None,
        max_frame_num_to_track: int | None = None,
        reverse: bool = False,
        yield_packed_masks: bool = False,
    ):
        """Generator over (frame_idx, obj_ids, video_res_masks)
        (sam2_video_predictor.py:584-667). Masks are device arrays at the
        original video resolution (the reference yields GPU tensors too);
        np.asarray materializes them. With yield_packed_masks=True the
        third element is instead a bit-packed uint8 array of (mask > 0)
        along width — np.unpackbits(m, axis=-1)[..., :W] undoes it — an 8x
        readback-byte cut for serving consumers that only need booleans."""
        state = inference_state
        self.propagate_in_video_preflight(state)

        output_dict = state["output_dict"]
        num_frames = state["num_frames"]
        batch_size = len(state["obj_idx_to_id"])
        if len(output_dict["cond_frame_outputs"]) == 0:
            raise RuntimeError("No points provided; please add points first")

        if start_frame_idx is None:
            start_frame_idx = min(output_dict["cond_frame_outputs"])
        if max_frame_num_to_track is None:
            max_frame_num_to_track = num_frames
        if reverse:
            end_frame_idx = max(start_frame_idx - max_frame_num_to_track, 0)
            processing_order = (
                range(start_frame_idx, end_frame_idx - 1, -1)
                if start_frame_idx > 0
                else []
            )
        else:
            end_frame_idx = min(
                start_frame_idx + max_frame_num_to_track, num_frames - 1
            )
            processing_order = range(start_frame_idx, end_frame_idx + 1)

        bank = None
        if self.device_resident:
            from sam2unet_tpu.predictors.video_device import (
                DeviceMemoryBank,
                build_device_track_step,
            )

            bank = DeviceMemoryBank(self, state, output_dict, batch_size)
            if self._device_step is None:
                self._device_step = build_device_track_step(self)

        for frame_idx in processing_order:
            device_masks = None
            if frame_idx in state["consolidated_frame_inds"]["cond_frame_outputs"]:
                storage_key = "cond_frame_outputs"
                current_out = output_dict[storage_key][frame_idx]
                pred_masks = current_out["pred_masks"]
                clear_non_cond = self.clear_non_cond_mem_around_input and (
                    self.clear_non_cond_mem_for_multi_obj or batch_size <= 1
                )
                if clear_non_cond:
                    self._clear_non_cond_mem_around_input(state, frame_idx)
            elif frame_idx in state["consolidated_frame_inds"][
                "non_cond_frame_outputs"
            ]:
                storage_key = "non_cond_frame_outputs"
                current_out = output_dict[storage_key][frame_idx]
                pred_masks = current_out["pred_masks"]
            elif bank is not None:
                storage_key = "non_cond_frame_outputs"
                current_out, device_masks = self._run_device_frame(
                    state, output_dict, bank, frame_idx, reverse,
                    yield_packed_masks,
                )
                output_dict[storage_key][frame_idx] = current_out
                self._add_output_per_object(
                    state, frame_idx, current_out, storage_key
                )
                pred_masks = current_out["pred_masks"]
            else:
                storage_key = "non_cond_frame_outputs"
                current_out = self._run_single_frame_inference(
                    state,
                    output_dict=output_dict,
                    frame_idx=frame_idx,
                    batch_size=batch_size,
                    is_init_cond_frame=False,
                    point_inputs=None,
                    mask_inputs=None,
                    reverse=reverse,
                    run_mem_encoder=True,
                )
                output_dict[storage_key][frame_idx] = current_out
                self._add_output_per_object(
                    state, frame_idx, current_out, storage_key
                )
                pred_masks = current_out["pred_masks"]
            state["frames_already_tracked"][frame_idx] = {"reverse": reverse}
            if device_masks is not None:
                video_res_masks = device_masks
            else:
                _, video_res_masks = self._get_orig_video_res_output(
                    state, pred_masks
                )
                if yield_packed_masks:
                    video_res_masks = np.packbits(
                        np.asarray(video_res_masks) > 0, axis=-1
                    )
            yield frame_idx, state["obj_ids"], video_res_masks

    def _run_device_frame(self, state, output_dict, bank, frame_idx,
                          reverse, yield_packed_masks):
        """Track one frame entirely on device: one dispatch, memory bank
        read/updated in place (no host gather/concat/re-upload —
        sam2_video_predictor.py:801-813's storage-device design, TPU-first)."""
        meta = bank.gather_meta(state, output_dict, frame_idx, reverse)
        frame_u8 = jnp.asarray(
            np.ascontiguousarray(state["images"][frame_idx])
        )
        (bank.grid_ring, bank.ptr_ring, low, video_res, packed, obj_ptr,
         feats, _) = self._device_step(
            self.variables, frame_u8, bank.cond_mem, bank.cond_ptr,
            bank.spatial_penc, bank.grid_ring, bank.ptr_ring,
            meta["g_idx"], meta["g_tpos"], meta["g_valid"],
            meta["store_slot"], meta["ptr_store_slot"],
            p_idx=meta.get("p_idx"), p_tdiff=meta.get("p_tdiff"),
            p_valid=meta.get("p_valid"), t_diff_max=meta.get("t_diff_max"),
            pack_masks=yield_packed_masks,
        )
        bank.note_tracked(frame_idx)
        if state["offload_state_to_cpu"]:
            # the knob is real on this path: outputs leave HBM eagerly —
            # one batched readback (device_get overlaps the D2H copies;
            # serialized np.asarray pays a tunnel round trip per array)
            low, obj_ptr, feats = jax.device_get((low, obj_ptr, feats))
            feats = np.asarray(feats, np.float32)
        current_out = {
            "point_inputs": None,
            "mask_inputs": None,
            "pred_masks": low,
            "obj_ptr": obj_ptr,
            "maskmem_features": feats,
            "maskmem_pos_enc": bank.penc_list,
        }
        return current_out, (packed if yield_packed_masks else video_res)

    def _add_output_per_object(self, state, frame_idx, current_out, storage_key):
        """(sam2_video_predictor.py:669-696)."""
        maskmem_features = current_out["maskmem_features"]
        maskmem_pos_enc = current_out["maskmem_pos_enc"]
        for obj_idx in state["output_dict_per_obj"]:
            sl = slice(obj_idx, obj_idx + 1)
            obj_out = {
                "maskmem_features": None,
                "maskmem_pos_enc": None,
                "pred_masks": current_out["pred_masks"][sl],
                "obj_ptr": current_out["obj_ptr"][sl],
            }
            if maskmem_features is not None:
                obj_out["maskmem_features"] = maskmem_features[sl]
                obj_out["maskmem_pos_enc"] = maskmem_pos_enc
            state["output_dict_per_obj"][obj_idx][storage_key][frame_idx] = obj_out

    def _clear_non_cond_mem_around_input(self, state, frame_idx):
        """(sam2_video_predictor.py:881-898). Frames holding consolidated
        INPUT outputs (fresh clicks) are preserved: they are authoritative
        post-correction results the propagation loop serves from cache —
        the reference pops them too and then KeyErrors on that cache read."""
        r = self.cfg.memory_temporal_stride_for_eval
        frame_idx_begin = frame_idx - r * self.cfg.num_maskmem
        frame_idx_end = frame_idx + r * self.cfg.num_maskmem
        non_cond = state["output_dict"]["non_cond_frame_outputs"]
        keep = state["consolidated_frame_inds"]["non_cond_frame_outputs"]
        for t in range(frame_idx_begin, frame_idx_end + 1):
            if t == frame_idx or t in keep:
                continue
            non_cond.pop(t, None)
            for obj_out in state["output_dict_per_obj"].values():
                obj_out["non_cond_frame_outputs"].pop(t, None)

    # ----------------------------------------------------------- features

    def _prepare_frame(self, state, frame_idx) -> np.ndarray:
        img = state["images"][frame_idx]
        return self._transforms(img)[None]

    def _get_image_feature(self, state, frame_idx, batch_size):
        """(sam2_video_predictor.py:698-759) with an LRU of 1 frame."""
        cached = state["cached_features"].get(frame_idx)
        if cached is None:
            x = self._prepare_frame(state, frame_idx)
            backbone_out = self._jit_forward_image(self.variables, jnp.asarray(x))
            state["cached_features"] = {frame_idx: backbone_out}
            cached = backbone_out
        fpn = cached["backbone_fpn"]
        pos = cached["vision_pos_enc"]
        if batch_size > 1:
            fpn = [jnp.repeat(f, batch_size, axis=0) for f in fpn]
            pos = [jnp.repeat(p, batch_size, axis=0) for p in pos]
        return fpn, pos

    # ----------------------------------------------------- frame tracking

    def _host_param(self, *path: str) -> np.ndarray:
        """Constant param as cached host numpy (fp32): the host-gather path
        reads these every frame, and each separate device read pays a
        tunnel round trip."""
        if path not in self._host_params:
            node = self.variables["params"]
            for p in path:
                node = node[p]
            self._host_params[path] = np.asarray(node, np.float32)
        return self._host_params[path]

    def _gather_memory(self, state, output_dict, frame_idx, batch_size,
                       track_in_reverse):
        """Host half of _prepare_memory_conditioned_features
        (sam2_base.py:504-662): select frames, assemble the memory token
        stack PADDED to a fixed shape (mask-mem grids padded to num_maskmem
        slots — or the next multiple of 4 with many cond frames — and
        obj-ptr tokens padded to max_obj_ptrs_in_encoder), with a validity
        mask. One jit signature then serves every frame from frame 2 on;
        the reference has no warm-up cliff and now neither do we."""
        cfg = self.cfg
        params = self.variables["params"]
        cond_outputs = output_dict["cond_frame_outputs"]
        selected_cond, unselected_cond = select_closest_cond_frames(
            frame_idx, cond_outputs, cfg.max_cond_frames_in_attn
        )
        t_pos_and_prevs = [(0, out) for out in selected_cond.values()]
        r = cfg.memory_temporal_stride_for_eval
        for t_pos in range(1, cfg.num_maskmem):
            t_rel = cfg.num_maskmem - t_pos
            if t_rel == 1:
                prev_frame_idx = (
                    frame_idx + t_rel if track_in_reverse else frame_idx - t_rel
                )
            elif not track_in_reverse:
                prev_frame_idx = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
            else:
                prev_frame_idx = -(-(frame_idx + 2) // r) * r + (t_rel - 2) * r
            out = output_dict["non_cond_frame_outputs"].get(prev_frame_idx)
            if out is None:
                out = unselected_cond.get(prev_frame_idx)
            t_pos_and_prevs.append((t_pos, out))

        grids, grid_pos = [], []
        tpos_enc = self._host_param("maskmem_tpos_enc")
        for t_pos, prev in t_pos_and_prevs:
            if prev is None:
                continue
            feats = np.asarray(prev["maskmem_features"], np.float32)
            b, h, w, c = feats.shape
            grids.append(feats.reshape(b, h * w, c))
            enc = np.asarray(prev["maskmem_pos_enc"][-1], np.float32)
            enc = np.broadcast_to(enc.reshape(1, h * w, c), (b, h * w, c))
            enc = enc + tpos_enc[cfg.num_maskmem - t_pos - 1].reshape(1, 1, c)
            grid_pos.append(enc)

        # pad grid count to a fixed slot count (RoPE needs whole h*w grids)
        n_g, hw, c = len(grids), grids[0].shape[1], grids[0].shape[2]
        slots = (cfg.num_maskmem if n_g <= cfg.num_maskmem
                 else -(-n_g // 4) * 4)
        zero_grid = np.zeros((batch_size, hw, c), np.float32)
        mems = grids + [zero_grid] * (slots - n_g)
        mem_pos = grid_pos + [zero_grid] * (slots - n_g)
        valid_parts = [np.ones(n_g * hw, bool), np.zeros((slots - n_g) * hw, bool)]

        num_obj_ptr_tokens = 0
        if cfg.use_obj_ptrs_in_encoder:
            C, mem_dim = cfg.hidden_dim, cfg.mem_dim
            split = C // mem_dim if mem_dim < C else 1
            # fixed slot count per propagation pass: the reference caps only
            # the NON-cond pointers at max_obj_ptrs_in_encoder - 1 and
            # includes every selected cond pointer on top
            # (sam2_base.py:570-620) — so the pad target must bound
            # n_cond + max - 1, not max (which underflowed the pad width
            # with >1 cond frame on long videos)
            n_cond_bound = len(output_dict["cond_frame_outputs"])
            if cfg.max_cond_frames_in_attn > 0:
                n_cond_bound = min(n_cond_bound, cfg.max_cond_frames_in_attn)
            ptr_slots = (
                n_cond_bound + cfg.max_obj_ptrs_in_encoder - 1
            ) * split
            max_ptrs = min(state["num_frames"], cfg.max_obj_ptrs_in_encoder)
            if cfg.only_obj_ptrs_in_the_past_for_eval:
                ptr_cond = {
                    t: out for t, out in selected_cond.items()
                    if (t >= frame_idx if track_in_reverse else t <= frame_idx)
                }
            else:
                ptr_cond = selected_cond
            pos_and_ptrs = [
                (abs(frame_idx - t), out["obj_ptr"]) for t, out in ptr_cond.items()
            ]
            for t_diff in range(1, max_ptrs):
                t = frame_idx + t_diff if track_in_reverse else frame_idx - t_diff
                if t < 0 or t >= state["num_frames"]:
                    break
                out = output_dict["non_cond_frame_outputs"].get(
                    t, unselected_cond.get(t)
                )
                if out is not None:
                    pos_and_ptrs.append((t_diff, out["obj_ptr"]))
            if pos_and_ptrs:
                pos_list, ptr_list = zip(*pos_and_ptrs)
                obj_ptrs = np.stack(
                    [np.asarray(p, np.float32) for p in ptr_list], axis=1
                )  # (B, P, C)
                if cfg.add_tpos_enc_to_obj_ptrs:
                    t_diff_max = max_ptrs - 1
                    tdim = C if cfg.proj_tpos_enc_in_obj_ptrs else mem_dim
                    # host numpy PE (same formula as get_1d_sine_pe) — the
                    # jnp version cost one device dispatch + readback per
                    # frame for a tiny positional table
                    obj_pos = _sine_pe_np(
                        np.asarray(pos_list, np.float32) / t_diff_max, tdim
                    )
                    if cfg.proj_tpos_enc_in_obj_ptrs:
                        w_ = self._host_param("obj_ptr_tpos_proj", "kernel")
                        b_ = self._host_param("obj_ptr_tpos_proj", "bias")
                        obj_pos = obj_pos @ w_ + b_
                    obj_pos = np.broadcast_to(
                        obj_pos[None], (batch_size, len(pos_list), mem_dim)
                    )
                else:
                    obj_pos = np.zeros(
                        (batch_size, len(pos_list), mem_dim), np.float32
                    )
                if mem_dim < C:
                    obj_ptrs = obj_ptrs.reshape(
                        batch_size, -1, split, mem_dim
                    ).reshape(batch_size, -1, mem_dim)
                    obj_pos = np.repeat(obj_pos, split, axis=1)
            else:
                obj_ptrs = np.zeros((batch_size, 0, mem_dim), np.float32)
                obj_pos = np.zeros((batch_size, 0, mem_dim), np.float32)
            # pad the pointer block to its fixed slot count
            p_tok = obj_ptrs.shape[1]
            pad = np.zeros((batch_size, ptr_slots - p_tok, mem_dim), np.float32)
            mems.append(np.concatenate([obj_ptrs, pad], axis=1))
            mem_pos.append(np.concatenate([obj_pos, pad], axis=1))
            valid_parts += [np.ones(p_tok, bool),
                            np.zeros(ptr_slots - p_tok, bool)]
            num_obj_ptr_tokens = ptr_slots

        # upload in the model's compute dtype: the memory bank is the
        # largest per-frame host->device transfer (~1.9 MB f32 per object
        # batch) and the reference stores mask memories as bf16 anyway
        # (sam2_video_predictor.py:805)
        np_dt = np.dtype(jnp.dtype(self.model.dtype).name)
        memory = np.concatenate(mems, axis=1).astype(np_dt)
        memory_pos = np.concatenate(mem_pos, axis=1).astype(np_dt)
        valid = np.broadcast_to(
            np.concatenate(valid_parts)[None], memory.shape[:2]
        )
        return memory, memory_pos, valid, num_obj_ptr_tokens

    def _run_single_frame_inference(
        self,
        state,
        output_dict,
        frame_idx,
        batch_size,
        is_init_cond_frame,
        point_inputs,
        mask_inputs,
        reverse,
        run_mem_encoder,
        prev_sam_mask_logits=None,
    ):
        """track_step (sam2_base.py:704-799) orchestrated on the host."""
        cfg = self.cfg
        fpn, pos = self._get_image_feature(state, frame_idx, batch_size)
        high_res = (fpn[0], fpn[1])
        top_feat, top_pos = fpn[-1], pos[-1]

        if mask_inputs is not None and cfg.use_mask_input_as_output_without_sam:
            mi = jnp.asarray(
                np.broadcast_to(
                    mask_inputs.transpose(0, 2, 3, 1),
                    (batch_size, cfg.image_size, cfg.image_size, 1),
                )
            )
            sam_outputs = self._jit_mask_as_output(
                self.variables, top_feat, high_res[0], high_res[1], mi
            )
            feats_d = penc_d = None
        else:
            if is_init_cond_frame:
                memory = memory_pos = valid = None
                nptr = 0
            else:
                memory, memory_pos, valid, nptr = self._gather_memory(
                    state, output_dict, frame_idx, batch_size, reverse
                )
                memory = jnp.asarray(memory)
                memory_pos = jnp.asarray(memory_pos)
                valid = jnp.asarray(valid)
            mi = None
            if prev_sam_mask_logits is not None:
                mi = jnp.asarray(
                    np.asarray(prev_sam_mask_logits, np.float32).transpose(0, 2, 3, 1)
                )
            elif mask_inputs is not None:
                # use_mask_input_as_output_without_sam=False: the provided
                # mask is the SAM dense prompt (sam2_base.py:758-767)
                mi = jnp.asarray(
                    np.broadcast_to(
                        np.asarray(mask_inputs, np.float32).transpose(0, 2, 3, 1),
                        (batch_size, *mask_inputs.shape[2:], 1),
                    )
                )
            if point_inputs is not None:
                coords = jnp.asarray(point_inputs["point_coords"])
                labels = jnp.asarray(point_inputs["point_labels"])
                num_pts = point_inputs["point_labels"].shape[1]
            else:
                coords = jnp.zeros((batch_size, 1, 2), jnp.float32)
                labels = -jnp.ones((batch_size, 1), jnp.int32)
                num_pts = 0
            multimask = self.model.use_multimask(is_init_cond_frame, num_pts)
            sam_outputs, feats_d, penc_d = self._jit_track(
                self.variables, top_feat, top_pos,
                memory, memory_pos, valid, nptr, coords, labels, mi,
                high_res[0], high_res[1], multimask,
                encode=(run_mem_encoder and cfg.num_maskmem > 0),
                from_pts=(point_inputs is not None),
            )

        _, _, _, low_res_masks, high_res_masks, obj_ptr, _ = sam_outputs
        # one batched readback for everything this frame materializes:
        # device_get starts all D2H copies async, so the tunnel round trip
        # is paid once instead of once per array (docs/PERF.md round 3)
        low_res_masks, high_res_masks, obj_ptr, feats_d, penc_d = (
            jax.device_get(
                (low_res_masks, high_res_masks, obj_ptr, feats_d,
                 list(penc_d) if penc_d is not None else None)
            )
        )
        pred_masks = np.asarray(low_res_masks, np.float32)
        if self.fill_hole_area > 0:
            # (sam2_video_predictor.py:809-812 + misc.py:216-228): small
            # background components become foreground with score 0.1
            pred_masks = self._fill_holes(pred_masks)
        current_out = {
            "point_inputs": point_inputs,
            "mask_inputs": mask_inputs,
            "pred_masks": pred_masks,
            "pred_masks_high_res": np.asarray(high_res_masks, np.float32),
            "obj_ptr": np.asarray(obj_ptr, np.float32),
            "maskmem_features": None,
            "maskmem_pos_enc": None,
        }
        if feats_d is not None:
            current_out["maskmem_features"] = np.asarray(feats_d, np.float32)
            current_out["maskmem_pos_enc"] = [np.asarray(p, np.float32)
                                              for p in penc_d]
        elif run_mem_encoder and cfg.num_maskmem > 0:
            # mask-as-output frames encode from the provided mask
            feats, penc = self._run_memory_encoder_feats(
                top_feat, np.asarray(high_res_masks, np.float32),
                is_mask_from_pts=(point_inputs is not None),
            )
            current_out["maskmem_features"] = feats
            current_out["maskmem_pos_enc"] = penc
        return current_out

    def _fill_holes(self, masks: np.ndarray) -> np.ndarray:
        """Fill background connected components with area <= fill_hole_area
        with a small positive score (misc.py:216-228 semantics); masks are
        (B, 1, h, w) float scores."""
        from sam2unet_tpu.ops.connected_components import (
            label_components_native,
        )

        labels, areas = label_components_native((masks <= 0).astype(np.uint8))
        is_hole = (labels > 0) & (areas <= self.fill_hole_area)
        return np.where(is_hole, np.float32(0.1), masks)

    def _run_memory_encoder_feats(self, top_feat, high_res_masks, is_mask_from_pts):
        feats, pos = self._jit_encode_memory(
            self.variables, top_feat, jnp.asarray(high_res_masks),
            is_mask_from_pts,
        )
        return np.asarray(feats, np.float32), [np.asarray(p, np.float32)
                                               for p in pos]

    def _run_memory_encoder(self, state, frame_idx, batch_size, high_res_masks,
                            is_mask_from_pts):
        fpn, _ = self._get_image_feature(state, frame_idx, batch_size)
        return self._run_memory_encoder_feats(
            fpn[-1], high_res_masks, is_mask_from_pts
        )
