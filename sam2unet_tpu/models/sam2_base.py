"""SAM2 core model: image encoder + memory attention/encoder + SAM heads.

JAX re-design of sam2/modeling/sam2_base.py:22-829. Split of concerns vs
the reference: this module holds the *device* programs (pure functions of
params + fixed-shape tensors); the host-side memory-bank bookkeeping
(frame selection, dict state, variable-length gathers — sam2_base.py:493-662)
lives in predictors/video_predictor.py where Python is the right tool. The
device methods take already-gathered, fixed-shape memory token stacks, so
each (num_memories, num_obj_ptrs) combination is one cached jit program.

Config defaults follow sam2_configs/sam2_hiera_s.yaml:87-116.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from sam2unet_tpu.configs import HieraConfig
from sam2unet_tpu.models.fpn import ImageEncoder
from sam2unet_tpu.models.mask_decoder import MaskDecoder
from sam2unet_tpu.models.memory import MemoryAttention, MemoryEncoder
from sam2unet_tpu.models.prompt_encoder import PromptEncoder
from sam2unet_tpu.nn.layers import MLP
from sam2unet_tpu.ops.resize import resize

NO_OBJ_SCORE = -1024.0


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    image_size: int = 1024
    backbone_stride: int = 16
    num_maskmem: int = 7
    mem_dim: int = 64
    hidden_dim: int = 256
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    binarize_mask_from_pts_for_mem_enc: bool = False
    use_mask_input_as_output_without_sam: bool = True
    max_cond_frames_in_attn: int = -1
    directly_add_no_mem_embed: bool = True
    use_high_res_features_in_sam: bool = True
    multimask_output_in_sam: bool = True
    multimask_min_pt_num: int = 0
    multimask_max_pt_num: int = 1
    multimask_output_for_tracking: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    iou_prediction_use_sigmoid: bool = True
    memory_temporal_stride_for_eval: int = 1
    non_overlap_masks_for_mem_enc: bool = False
    use_obj_ptrs_in_encoder: bool = True
    max_obj_ptrs_in_encoder: int = 16
    add_tpos_enc_to_obj_ptrs: bool = False
    proj_tpos_enc_in_obj_ptrs: bool = False
    only_obj_ptrs_in_the_past_for_eval: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    fixed_no_obj_ptr: bool = True
    soft_no_obj_ptr: bool = False
    use_mlp_for_obj_ptr_proj: bool = True
    add_all_frames_to_correct_as_cond: bool = False
    # `sam_mask_decoder_extra_args` in the reference; the predictor builders
    # turn the stability fallback on (build_sam.py:25-31 apply_postprocessing)
    dynamic_multimask_via_stability: bool = False
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98


class SAM2Base(nn.Module):
    trunk_cfg: HieraConfig
    cfg: SAM2Config = SAM2Config()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dt = self.dtype
        self.image_encoder = ImageEncoder(
            trunk_cfg=self.trunk_cfg, d_model=c.hidden_dim, scalp=1, dtype=dt
        )
        self.memory_attention = MemoryAttention(
            d_model=c.hidden_dim, num_layers=4, kv_in_dim=c.mem_dim, dtype=dt
        )
        self.memory_encoder = MemoryEncoder(
            out_dim=c.mem_dim, in_dim=c.hidden_dim, dtype=dt
        )
        embed_size = c.image_size // c.backbone_stride
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=c.hidden_dim,
            image_embedding_size=(embed_size, embed_size),
            input_image_size=(c.image_size, c.image_size),
            mask_in_chans=16,
            dtype=dt,
        )
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=c.hidden_dim,
            num_multimask_outputs=3,
            iou_head_depth=3,
            iou_head_hidden_dim=256,
            use_high_res_features=c.use_high_res_features_in_sam,
            iou_prediction_use_sigmoid=c.iou_prediction_use_sigmoid,
            pred_obj_scores=c.pred_obj_scores,
            pred_obj_scores_mlp=c.pred_obj_scores_mlp,
            use_multimask_token_for_obj_ptr=c.use_multimask_token_for_obj_ptr,
            dynamic_multimask_via_stability=c.dynamic_multimask_via_stability,
            dynamic_multimask_stability_delta=c.dynamic_multimask_stability_delta,
            dynamic_multimask_stability_thresh=c.dynamic_multimask_stability_thresh,
            dtype=dt,
        )
        init = nn.initializers.normal(0.02)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", init, (c.num_maskmem, 1, 1, c.mem_dim)
        )
        self.no_mem_embed = self.param("no_mem_embed", init, (1, 1, c.hidden_dim))
        self.no_mem_pos_enc = self.param("no_mem_pos_enc", init, (1, 1, c.hidden_dim))
        # the reference creates no_obj_ptr only under (pred_obj_scores AND
        # use_obj_ptrs_in_encoder) yet reads it whenever pred_obj_scores —
        # that combo crashes upstream (sam2_base.py:169-170 vs :390-399).
        # Creating it under pred_obj_scores alone is strictly more robust
        # and cannot affect converted checkpoints (none exist for the
        # crashing combo).
        if c.pred_obj_scores:
            self.no_obj_ptr = self.param("no_obj_ptr", init, (1, c.hidden_dim))
        if c.use_obj_ptrs_in_encoder:
            self.mask_downsample = nn.Conv(1, (4, 4), strides=4, dtype=dt,
                                           name="mask_downsample")
            if c.use_mlp_for_obj_ptr_proj:
                self.obj_ptr_proj = MLP(c.hidden_dim, c.hidden_dim, num_layers=3,
                                        dtype=dt, name="obj_ptr_proj")
            else:
                self.obj_ptr_proj = nn.Dense(c.hidden_dim, dtype=dt,
                                             name="obj_ptr_proj")
        if c.proj_tpos_enc_in_obj_ptrs:
            self.obj_ptr_tpos_proj = nn.Dense(c.mem_dim, dtype=dt,
                                              name="obj_ptr_tpos_proj")

    # ------------------------------------------------------------- encoder

    def forward_image(self, img: jnp.ndarray, train: bool = False) -> dict:
        """(sam2_base.py:463-477): backbone + precomputed SAM high-res
        projections. img: (B, S, S, 3) NHWC normalized."""
        out = self.image_encoder(img, train)
        if self.cfg.use_high_res_features_in_sam:
            fpn = list(out["backbone_fpn"])
            fpn[0] = self.sam_mask_decoder.conv_s0(fpn[0])
            fpn[1] = self.sam_mask_decoder.conv_s1(fpn[1])
            out["backbone_fpn"] = fpn
        return out

    # ----------------------------------------------------------- sam heads

    def forward_sam_heads(
        self,
        backbone_features: jnp.ndarray,  # (B, H, W, C)
        point_coords: jnp.ndarray,       # (B, P, 2)
        point_labels: jnp.ndarray,       # (B, P)
        mask_inputs: jnp.ndarray | None = None,  # (B, S, S, 1) or low-res
        high_res_features: tuple | None = None,
        multimask_output: bool = False,
        train: bool = False,
    ):
        """(sam2_base.py:251-409). Returns the reference's 7-tuple with NHWC
        masks: (low_res_multimasks, high_res_multimasks, ious, low_res_masks,
        high_res_masks, obj_ptr, object_score_logits)."""
        c = self.cfg
        b = backbone_features.shape[0]

        sam_mask_prompt = None
        if mask_inputs is not None:
            target = self.sam_prompt_encoder.mask_input_size
            if mask_inputs.shape[1:3] != target:
                sam_mask_prompt = resize(
                    mask_inputs.astype(jnp.float32), target, "bilinear",
                    antialias=True,
                )
            else:
                sam_mask_prompt = mask_inputs

        sparse, dense = self.sam_prompt_encoder(
            point_coords, point_labels, boxes=None, masks=sam_mask_prompt
        )
        low_res_multimasks, ious, sam_output_tokens, object_score_logits = (
            self.sam_mask_decoder(
                image_embeddings=backbone_features,
                image_pe=self.sam_prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=multimask_output,
                high_res_features=high_res_features,
                train=train,
            )
        )
        if c.pred_obj_scores:
            is_obj = object_score_logits > 0
            low_res_multimasks = jnp.where(
                is_obj[:, :, None, None], low_res_multimasks, NO_OBJ_SCORE
            )
        low_res_multimasks = low_res_multimasks.astype(jnp.float32)
        # masks are (B, M, h, w); resize to image res
        m = low_res_multimasks.shape[1]
        hr = resize(
            low_res_multimasks.transpose(0, 2, 3, 1),
            (c.image_size, c.image_size),
            "bilinear",
        ).transpose(0, 3, 1, 2)

        sam_output_token = sam_output_tokens[:, 0]
        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            bidx = jnp.arange(b)
            low_res_masks = low_res_multimasks[bidx, best][:, None]
            high_res_masks = hr[bidx, best][:, None]
            if sam_output_tokens.shape[1] > 1:
                sam_output_token = sam_output_tokens[bidx, best]
        else:
            low_res_masks, high_res_masks = low_res_multimasks, hr

        if c.use_obj_ptrs_in_encoder:
            obj_ptr = self.obj_ptr_proj(sam_output_token)
        else:
            obj_ptr = jnp.zeros((b, c.hidden_dim), self.dtype)
        if c.pred_obj_scores:
            if c.soft_no_obj_ptr:
                lam = nn.sigmoid(object_score_logits)
            else:
                lam = (object_score_logits > 0).astype(jnp.float32)
            if c.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr

        return (
            low_res_multimasks, hr, ious, low_res_masks, high_res_masks,
            obj_ptr, object_score_logits,
        )

    def use_mask_as_output(self, backbone_features, high_res_features, mask_inputs):
        """(sam2_base.py:411-462): treat the input mask as the output."""
        c = self.cfg
        out_scale, out_bias = 20.0, -10.0
        mif = mask_inputs.astype(jnp.float32)  # (B, S, S, 1)
        high_res_masks = mif * out_scale + out_bias
        low_res_masks = resize(
            high_res_masks,
            (high_res_masks.shape[1] // 4, high_res_masks.shape[2] // 4),
            "bilinear", antialias=True,
        )
        b = mask_inputs.shape[0]
        ious = jnp.ones((b, 1), jnp.float32)
        if not c.use_obj_ptrs_in_encoder:
            obj_ptr = jnp.zeros((b, c.hidden_dim), self.dtype)
        else:
            ds = self.mask_downsample(mif)
            _, _, _, _, _, obj_ptr, _ = self.forward_sam_heads(
                backbone_features,
                point_coords=jnp.zeros((b, 1, 2), jnp.float32),
                point_labels=-jnp.ones((b, 1), jnp.int32),
                mask_inputs=ds,
                high_res_features=high_res_features,
            )
        is_obj = jnp.any(mif.reshape(b, -1) > 0.0, axis=1)[..., None]
        lam = is_obj.astype(jnp.float32)
        object_score_logits = out_scale * lam + out_bias
        if c.pred_obj_scores:
            if c.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr
        lr = low_res_masks.transpose(0, 3, 1, 2)
        hr = high_res_masks.transpose(0, 3, 1, 2)
        return (lr, hr, ious, lr, hr, obj_ptr, object_score_logits)

    # -------------------------------------------------------------- memory

    def condition_features_on_memory(
        self,
        current_feat: jnp.ndarray,       # (B, H, W, C) top-level feature
        current_pos: jnp.ndarray,        # (B, H, W, C) its sine PE
        memory: jnp.ndarray | None,      # (B, S_mem, mem_dim) gathered bank
        memory_pos: jnp.ndarray | None,  # (B, S_mem, mem_dim)
        num_obj_ptr_tokens: int = 0,
        is_init_cond_frame: bool = False,
        memory_valid: jnp.ndarray | None = None,  # (B, S_mem) bool
    ) -> jnp.ndarray:
        """Device half of _prepare_memory_conditioned_features
        (sam2_base.py:493-662); the host assembles `memory`/`memory_pos`.
        `memory_valid` marks real tokens when the bank is padded to a fixed
        shape (one compiled program serves every frame from frame 2 on)."""
        c = self.cfg
        b, h, w, ch = current_feat.shape
        feats = current_feat.reshape(b, h * w, ch)
        pos = current_pos.reshape(b, h * w, ch)

        if c.num_maskmem == 0:
            return current_feat
        if is_init_cond_frame:
            if c.directly_add_no_mem_embed:
                return (feats + self.no_mem_embed).reshape(b, h, w, ch)
            # memory tokens are mem_dim-wide (the k/v projections are built
            # for them); the reference's expand(1, B, mem_dim) fallback
            # (sam2_base.py:646-647) only type-checks when
            # mem_dim == hidden_dim and crashes otherwise — slice to
            # mem_dim so both cases run (identical where the reference ran)
            memory = jnp.broadcast_to(
                self.no_mem_embed[:, :, : c.mem_dim], (b, 1, c.mem_dim)
            ).astype(self.dtype)
            memory_pos = jnp.broadcast_to(
                self.no_mem_pos_enc[:, :, : c.mem_dim], (b, 1, c.mem_dim)
            ).astype(self.dtype)
            num_obj_ptr_tokens = 0
            memory_valid = None

        out = self.memory_attention(
            curr=feats,
            memory=memory,
            curr_pos=pos,
            memory_pos=memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens,
            memory_valid=memory_valid,
        )
        return out.reshape(b, h, w, ch)

    def encode_new_memory(
        self,
        current_feat: jnp.ndarray,       # (B, H, W, C)
        pred_masks_high_res: jnp.ndarray,  # (B, 1, S, S) logits
        is_mask_from_pts: bool = False,
        train: bool = False,
    ):
        """(sam2_base.py:664-702)."""
        c = self.cfg
        masks = pred_masks_high_res.transpose(0, 2, 3, 1)  # NHWC
        if c.non_overlap_masks_for_mem_enc and not train:
            masks = self.apply_non_overlapping_constraints(masks)
        binarize = c.binarize_mask_from_pts_for_mem_enc and is_mask_from_pts
        if binarize and not train:
            mask_for_mem = (masks > 0).astype(jnp.float32)
        else:
            mask_for_mem = nn.sigmoid(masks)
        mask_for_mem = (
            mask_for_mem * c.sigmoid_scale_for_mem_enc + c.sigmoid_bias_for_mem_enc
        )
        out = self.memory_encoder(current_feat, mask_for_mem, skip_mask_sigmoid=True)
        return out["vision_features"], out["vision_pos_enc"]

    @staticmethod
    def apply_non_overlapping_constraints(pred_masks: jnp.ndarray) -> jnp.ndarray:
        """(sam2_base.py:812-829), object dim is the batch dim; NHWC input."""
        batch = pred_masks.shape[0]
        if batch == 1:
            return pred_masks
        max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
        obj_idx = jnp.arange(batch)[:, None, None, None]
        keep = max_obj == obj_idx
        return jnp.where(keep, pred_masks, jnp.clip(pred_masks, max=-10.0))

    def use_multimask(self, is_init_cond_frame: bool, num_pts: int) -> bool:
        """(sam2_base.py:791-799) — static host-side decision."""
        c = self.cfg
        return (
            c.multimask_output_in_sam
            and (is_init_cond_frame or c.multimask_output_for_tracking)
            and (c.multimask_min_pt_num <= num_pts <= c.multimask_max_pt_num)
        )
