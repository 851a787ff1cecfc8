"""SAM2 image predictor: cache image embeddings, predict masks per prompt.

API-compatible re-design of sam2/sam2_image_predictor.py:20-447 for JAX:
the predictor owns the model + variables and jits two programs — feature
extraction and the prompt->mask path — cached per prompt count. Numpy in,
numpy out; prompts use the reference's conventions (XY pixel coords, labels
1/0 fg/bg, boxes XYXY merged as corner points 2/3)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sam2unet_tpu.models.sam2_base import SAM2Base
from sam2unet_tpu.predictors.transforms import SAM2Transforms
from sam2unet_tpu.utils.amg import unpack_bits


def _assemble_prompts(box_coords, point_coords, point_labels):
    """Merge model-resolution box-corner tokens + point tokens into one
    (B, P, 2)/(B, P) pair, ALWAYS appending the reference's pad point:
    SAM2's image predictor merges boxes into corner points and calls the
    prompt encoder with boxes=None, so pad=(boxes is None) is always True
    (sam2_image_predictor.py:380-388, prompt_encoder.py:169) — including
    for box prompts. With no prompts at all returns zero-length token
    arrays (the reference's concat_points=None -> (B, 0, C) sparse)."""
    pieces_c, pieces_l = [], []
    if box_coords is not None:
        bc = np.asarray(box_coords, np.float32).reshape(-1, 2, 2)
        pieces_c.append(bc)
        pieces_l.append(np.tile(np.array([[2, 3]], np.int32), (bc.shape[0], 1)))
    if point_coords is not None:
        pc = np.asarray(point_coords, np.float32)
        if pc.ndim == 2:
            pc = pc[None]
        pl = np.asarray(point_labels, np.int32)
        if pl.ndim == 1:
            pl = pl[None]
        pieces_c.append(pc)
        pieces_l.append(pl)
    if not pieces_c:
        return np.zeros((1, 0, 2), np.float32), np.zeros((1, 0), np.int32)
    coords = np.concatenate(pieces_c, axis=1)
    labels = np.concatenate(pieces_l, axis=1)
    b = coords.shape[0]
    coords = np.concatenate([coords, np.zeros((b, 1, 2), np.float32)], axis=1)
    labels = np.concatenate([labels, -np.ones((b, 1), np.int32)], axis=1)
    return coords.astype(np.float32), labels.astype(np.int32)


def _unpack_masks(full, hw, scratch_key: str | None = None) -> np.ndarray:
    """Device-postprocessed masks back to numpy: bit-packed uint8 rows
    (binarize path) are unpacked to bool at the original width; float
    logits pass through. scratch_key reuses a warm unpack buffer (see
    utils.amg.ScratchBuffers) — only for callers that fully consume the
    masks before the next unpack with the same key."""
    masks = np.asarray(full)
    if masks.dtype == np.uint8:
        masks = unpack_bits(masks, hw[1], scratch_key=scratch_key)
    return masks


class SAM2ImagePredictor:
    def __init__(
        self,
        model: SAM2Base,
        variables: dict,
        mask_threshold: float = 0.0,
        max_hole_area: float = 0.0,
        max_sprinkle_area: float = 0.0,
    ) -> None:
        self.model = model
        self.variables = variables
        self.mask_threshold = mask_threshold
        self._transforms = SAM2Transforms(
            resolution=model.cfg.image_size,
            mask_threshold=mask_threshold,
            max_hole_area=max_hole_area,
            max_sprinkle_area=max_sprinkle_area,
        )
        self._features = None
        self._orig_hw: list[tuple[int, int]] = []
        self._is_batch = False

        self._forward_image = jax.jit(
            lambda v, x: model.apply(v, x, method=SAM2Base.forward_image)
        )
        self._decode = jax.jit(
            partial(self._decode_fn),
            static_argnames=("multimask_output", "orig_hw", "binarize",
                             "amg_stats", "stability_offset", "with_low_res",
                             "amg_threshold"),
        )

    # ------------------------------------------------------------ features

    def set_image(self, image: np.ndarray) -> None:
        """image: HWC RGB uint8/float in [0, 255]."""
        self.reset_predictor()
        self._orig_hw = [tuple(image.shape[:2])]
        x = self._transforms(image)[None]
        self._compute_features(x)

    def set_image_batch(self, image_list: list[np.ndarray]) -> None:
        self.reset_predictor()
        self._orig_hw = [tuple(im.shape[:2]) for im in image_list]
        x = self._transforms.forward_batch(image_list)
        self._compute_features(x)
        self._is_batch = True

    def _compute_features(self, x: np.ndarray) -> None:
        out = self._forward_image(self.variables, jnp.asarray(x))
        feats = list(out["backbone_fpn"])
        # add no_mem_embed to the lowest-res level (image use matches video
        # training; sam2_image_predictor.py:100-103)
        if self.model.cfg.directly_add_no_mem_embed:
            f = feats[-1]
            b, h, w, c = f.shape
            nme = self.variables["params"]["no_mem_embed"]
            feats[-1] = (f.reshape(b, h * w, c) + nme).reshape(b, h, w, c)
        self._features = {"image_embed": feats[-1], "high_res_feats": feats[:-1]}

    # ------------------------------------------------------------- predict

    def predict(
        self,
        point_coords: np.ndarray | None = None,
        point_labels: np.ndarray | None = None,
        box: np.ndarray | None = None,
        mask_input: np.ndarray | None = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ):
        """Returns (masks (M,H,W), iou (M,), low_res_logits (M,h,w))."""
        if self._features is None:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        coords, labels = self._prep_prompts(
            point_coords, point_labels, box, normalize_coords, img_idx=0
        )
        masks, ious, low_res = self._run(
            0, coords, labels, mask_input, multimask_output,
            binarize=not return_logits,
        )
        if not return_logits and masks.dtype != np.bool_:
            masks = masks > self.mask_threshold
        return masks[0], ious[0], low_res[0]

    def predict_batch(
        self,
        point_coords_batch=None,
        point_labels_batch=None,
        box_batch=None,
        mask_input_batch=None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ):
        assert self._is_batch, "call set_image_batch first"
        n = len(self._orig_hw)
        all_masks, all_ious, all_low = [], [], []
        for i in range(n):
            pc = point_coords_batch[i] if point_coords_batch is not None else None
            pl = point_labels_batch[i] if point_labels_batch is not None else None
            bx = box_batch[i] if box_batch is not None else None
            mi = mask_input_batch[i] if mask_input_batch is not None else None
            coords, labels = self._prep_prompts(pc, pl, bx, normalize_coords, i)
            masks, ious, low = self._run(i, coords, labels, mi, multimask_output,
                                         binarize=not return_logits)
            if not return_logits and masks.dtype != np.bool_:
                masks = masks > self.mask_threshold
            all_masks.append(masks[0])
            all_ious.append(ious[0])
            all_low.append(low[0])
        return all_masks, all_ious, all_low

    def _prep_prompts(self, point_coords, point_labels, box, normalize, img_idx):
        bc = None
        if box is not None:
            bc = self._transforms.transform_boxes(
                box, normalize=normalize, orig_hw=self._orig_hw[img_idx]
            ).reshape(1, 2, 2)
        pc = None
        if point_coords is not None:
            assert point_labels is not None
            pc = self._transforms.transform_coords(
                np.asarray(point_coords, np.float32),
                normalize=normalize, orig_hw=self._orig_hw[img_idx],
            )
        return _assemble_prompts(bc, pc, point_labels)

    def _decode_fn(self, variables, image_embed, high0, high1, coords, labels,
                   mask_input, multimask_output, orig_hw=None, binarize=False,
                   amg_stats=False, stability_offset=1.0, with_low_res=True,
                   amg_threshold=None):
        """Prompt -> mask program. With orig_hw the whole serving postprocess
        (clip, upscale to the original resolution, optional threshold) runs
        on device inside the same jit — the readback is then the final mask
        (1 byte/px when binarize) instead of fp32 logits resized on host
        (sam2/utils/transforms.py:74-99 does this work in torch on device;
        the earlier host-numpy port dominated serving latency, docs/PERF.md)."""

        def run(m):
            sparse, dense = m.sam_prompt_encoder(coords, labels, None, mask_input)
            low_res, ious, _, _ = m.sam_mask_decoder(
                image_embeddings=image_embed,
                image_pe=m.sam_prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=multimask_output,
                high_res_features=(high0, high1),
            )
            low_res = jnp.clip(low_res.astype(jnp.float32), -32.0, 32.0)
            if orig_hw is None:
                return low_res, ious, low_res
            # exact-taps torch-parity resize (ops/resize): identical weights
            # to the host postprocess_masks path — jax.image.resize would
            # antialias on downscale and diverge from the reference
            from sam2unet_tpu.ops.resize import resize as _device_resize

            full = _device_resize(
                low_res.transpose(0, 2, 3, 1), orig_hw
            ).transpose(0, 3, 1, 2)

            def pack(m):
                # bit-pack along width: the host<->device link is the
                # serving bottleneck (measured 29 vs 57 ms/call packed vs
                # bool at 720x960x3, docs/PERF.md); np.unpackbits undoes it
                wpad = (-orig_hw[1]) % 8
                if wpad:
                    m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, wpad)))
                u = m.reshape(*m.shape[:-1], -1, 8).astype(jnp.uint8)
                bits = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
                return jnp.sum(u * bits, axis=-1, dtype=jnp.uint8)

            if amg_stats:
                # device-side AMG batch postprocess: stability score + the
                # binarized packed masks; the fp32 full-res logits (236 MB
                # per 64-point batch at 480x640) never cross the link
                # (automatic_mask_generator.py:270-298 does this on host)
                # the AMG owns its threshold independently of the predictor's
                # (automatic_mask_generator.py:45,140 vs sam2_image_predictor.py:24)
                thr = self.mask_threshold if amg_threshold is None else amg_threshold
                hi = jnp.sum(full > (thr + stability_offset), axis=(-1, -2))
                lo = jnp.sum(full > (thr - stability_offset), axis=(-1, -2))
                # union == 0 (empty mask at the loose threshold) scores 0:
                # the reference computes 0/0 = NaN there, which fails its
                # >= thresh filter — score 0 drops the same candidates
                # (sam2/utils/amg.py:158-178)
                stability = jnp.where(
                    lo > 0,
                    hi.astype(jnp.float32) / jnp.maximum(lo, 1),
                    0.0,
                )
                packed = pack(full > thr)
                lr = low_res if with_low_res else low_res[:, :, :1, :1]
                return packed, ious, lr, stability
            if binarize:
                full = pack(full > self.mask_threshold)
            return full, ious, low_res

        return self.model.apply(variables, method=run)

    def _run(self, img_idx, coords, labels, mask_input, multimask_output,
             binarize=False):
        image_embed = self._features["image_embed"][img_idx : img_idx + 1]
        high0 = self._features["high_res_feats"][0][img_idx : img_idx + 1]
        high1 = self._features["high_res_feats"][1][img_idx : img_idx + 1]
        mi = None
        if mask_input is not None:
            mi = np.asarray(mask_input, np.float32)
            if mi.ndim == 3:
                mi = mi[None]
            mi = jnp.asarray(mi.transpose(0, 2, 3, 1))
        # hole/sprinkle filling needs the host CCL op; otherwise the full
        # postprocess stays on device and only the final mask is read back
        device_post = (self._transforms.max_hole_area == 0
                       and self._transforms.max_sprinkle_area == 0)
        full, ious, low_res = self._decode(
            self.variables, image_embed, high0, high1,
            jnp.asarray(coords), jnp.asarray(labels), mi,
            multimask_output=multimask_output,
            orig_hw=tuple(self._orig_hw[img_idx]) if device_post else None,
            binarize=binarize and device_post,
        )
        # one batched readback: device_get starts every D2H copy async
        # before converting — serialized np.asarray calls each pay a full
        # tunnel round trip (~30 ms), which inverted the device-vs-host
        # postprocess ordering (docs/PERF.md round 3)
        full, ious, low_res = jax.device_get((full, ious, low_res))
        low_res = np.asarray(low_res, np.float32)
        if device_post:
            masks = _unpack_masks(full, self._orig_hw[img_idx])
        else:
            masks = self._transforms.postprocess_masks(
                low_res, self._orig_hw[img_idx]
            )
        return masks[None] if masks.ndim == 3 else masks, np.asarray(ious), low_res

    def _predict(
        self,
        point_coords: np.ndarray | None,
        point_labels: np.ndarray | None,
        boxes: np.ndarray | None = None,
        mask_input: np.ndarray | None = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        img_idx: int = 0,
    ):
        """Batched-prompt predict on the set image (the reference's _predict,
        sam2_image_predictor.py:318-447): coords already in model-resolution
        pixels, B prompts against one image. Returns numpy
        (B, M, H, W), (B, M), (B, M, h, w)."""
        if self._features is None:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        coords, labels = _assemble_prompts(boxes, point_coords, point_labels)
        if coords.shape[1] == 0 and mask_input is not None:
            # mask-only prompting: B comes from the mask batch
            b0 = np.asarray(mask_input).shape[0]
            coords = np.zeros((b0, 0, 2), np.float32)
            labels = np.zeros((b0, 0), np.int32)

        b = coords.shape[0]
        # batch-1 features broadcast against B prompts inside the decoder
        # (src = image_embeddings + dense_prompt_embeddings) — repeating
        # them here would copy ~17 MB x B of HBM per AMG decode call
        image_embed = self._features["image_embed"][img_idx : img_idx + 1]
        high0 = self._features["high_res_feats"][0][img_idx : img_idx + 1]
        high1 = self._features["high_res_feats"][1][img_idx : img_idx + 1]
        mi = None
        if mask_input is not None:
            mi = np.asarray(mask_input, np.float32)
            if mi.ndim == 3:
                mi = mi[:, None]
            mi = jnp.asarray(mi.transpose(0, 2, 3, 1))
        hw = self._orig_hw[img_idx]
        # device postprocess needs the host CCL for hole filling, and a large
        # prompt batch (AMG) would materialize b*3*H*W fp32 on device — keep
        # those on the host path
        device_post = (self._transforms.max_hole_area == 0
                       and self._transforms.max_sprinkle_area == 0
                       and b * 3 * hw[0] * hw[1] <= 2**26)
        full, ious, low_res = self._decode(
            self.variables, image_embed, high0, high1,
            jnp.asarray(coords), jnp.asarray(labels), mi,
            multimask_output=multimask_output,
            orig_hw=tuple(hw) if device_post else None,
            binarize=(not return_logits) and device_post,
        )
        full, ious, low_res = jax.device_get((full, ious, low_res))
        low_res = np.asarray(low_res, np.float32)
        if device_post:
            masks = _unpack_masks(full, hw)
        else:
            masks = self._transforms.postprocess_masks(low_res, hw)
        if not return_logits and masks.dtype != np.bool_:
            masks = masks > self.mask_threshold
        return masks, np.asarray(ious), low_res

    def _predict_amg(
        self,
        point_coords: np.ndarray,
        point_labels: np.ndarray,
        multimask_output: bool = True,
        stability_offset: float = 1.0,
        need_low_res: bool = False,
        img_idx: int = 0,
        mask_threshold: float | None = None,
    ):
        """AMG fast path: the whole per-batch postprocess (clip, upscale,
        stability score, threshold, bit-pack) runs in the decode jit, so
        only packed bits + scores cross the host link instead of the fp32
        full-res logits. Returns numpy (B, M, H, W) bool masks, (B, M)
        ious, (B, M, h, w) low_res or None, (B, M) stability scores.
        Falls back to `_predict` + host stability when hole filling is
        requested or the batch would not fit device memory."""
        b = point_coords.shape[0]
        hw = self._orig_hw[img_idx]
        n_out = 3 if multimask_output else 1
        thr = self.mask_threshold if mask_threshold is None else float(mask_threshold)
        if (self._transforms.max_hole_area != 0
                or self._transforms.max_sprinkle_area != 0
                or b * n_out * hw[0] * hw[1] > 2**28):
            from sam2unet_tpu.utils.amg import calculate_stability_score

            masks, ious, low_res = self._predict(
                point_coords, point_labels,
                multimask_output=multimask_output, return_logits=True,
                img_idx=img_idx,
            )
            stability = calculate_stability_score(masks, thr, stability_offset)
            return (masks > thr, ious,
                    low_res if need_low_res else None, stability)

        coords = np.concatenate(
            [point_coords, np.zeros((b, 1, 2), np.float32)], axis=1
        )
        labels = np.concatenate(
            [point_labels, -np.ones((b, 1), np.int32)], axis=1
        )
        image_embed = self._features["image_embed"][img_idx : img_idx + 1]
        high0 = self._features["high_res_feats"][0][img_idx : img_idx + 1]
        high1 = self._features["high_res_feats"][1][img_idx : img_idx + 1]
        packed, ious, low_res, stability = self._decode(
            self.variables, image_embed, high0, high1,
            jnp.asarray(coords.astype(np.float32)),
            jnp.asarray(labels.astype(np.int32)), None,
            multimask_output=multimask_output,
            orig_hw=tuple(hw),
            amg_stats=True,
            stability_offset=float(stability_offset),
            with_low_res=need_low_res,
            amg_threshold=thr,
        )
        packed, ious, low_res, stability = jax.device_get(
            (packed, ious, low_res, stability)
        )
        # warm-buffer unpack: the AMG consumes each batch's masks (boxes +
        # RLE) before requesting the next, so reuse is safe — and a fresh
        # ~60 MB bool alloc per 192-mask batch page-faults at ~20-40 MB/s
        # on the serving host (docs/PERF.md round 3)
        masks = _unpack_masks(packed, hw, scratch_key="amg_unpack")
        return (
            masks,
            np.asarray(ious),
            np.asarray(low_res, np.float32) if need_low_res else None,
            np.asarray(stability, np.float32),
        )

    def get_image_embedding(self):
        if self._features is None:
            raise RuntimeError("An image must be set with .set_image(...) first.")
        return self._features["image_embed"]

    def reset_predictor(self) -> None:
        self._features = None
        self._orig_hw = []
        self._is_batch = False
