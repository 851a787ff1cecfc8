"""SAM mask decoder: IoU/mask tokens through the two-way transformer,
hypernetwork mask synthesis, stability-based multimask fallback.

JAX re-design of sam2/modeling/sam/mask_decoder.py:15-295. The dynamic
fallback (`_dynamic_multimask_via_stability`) is jnp.where-based so the
whole decoder is one jit program; `multimask_output` is a static argument.
NHWC throughout; upscaling uses ConvTranspose (stride 2) like the
reference's output_upscaling stack.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sam2unet_tpu.models.transformer import TwoWayTransformer
from sam2unet_tpu.nn.layers import MLP, gelu


class MaskDecoder(nn.Module):
    transformer_dim: int
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = False
    iou_prediction_use_sigmoid: bool = False
    dynamic_multimask_via_stability: bool = False
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    pred_obj_scores: bool = False
    pred_obj_scores_mlp: bool = False
    use_multimask_token_for_obj_ptr: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    def setup(self):
        d = self.transformer_dim
        dt = self.dtype
        init = nn.initializers.normal(1.0)
        self.transformer = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=d,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            dtype=dt,
        )
        self.iou_token = self.param("iou_token", init, (1, d))
        self.mask_tokens = self.param("mask_tokens", init, (self.num_mask_tokens, d))
        if self.pred_obj_scores:
            self.obj_score_token = self.param("obj_score_token", init, (1, d))

        # transpose_kernel=True matches torch ConvTranspose2d exactly
        self.upscale_conv1 = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                                              transpose_kernel=True, dtype=dt,
                                              name="output_upscaling_layers_0")
        self.upscale_ln = nn.LayerNorm(epsilon=1e-6, dtype=dt,
                                       name="output_upscaling_layers_1")
        self.upscale_conv2 = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                                              transpose_kernel=True, dtype=dt,
                                              name="output_upscaling_layers_3")
        if self.use_high_res_features:
            self.conv_s0 = nn.Conv(d // 8, (1, 1), dtype=dt)
            self.conv_s1 = nn.Conv(d // 4, (1, 1), dtype=dt)

        self.output_hypernetworks_mlps = [
            MLP(d, d // 8, num_layers=3, dtype=dt,
                name=f"output_hypernetworks_mlps_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim, self.num_mask_tokens,
            num_layers=self.iou_head_depth,
            sigmoid_output=self.iou_prediction_use_sigmoid, dtype=dt,
        )
        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                self.pred_obj_score_head = MLP(d, 1, num_layers=3, dtype=dt)
            else:
                self.pred_obj_score_head = nn.Dense(1, dtype=dt)

    def predict_masks(
        self,
        image_embeddings: jnp.ndarray,  # (B, H, W, C)
        image_pe: jnp.ndarray,          # (1, H, W, C)
        sparse_prompt_embeddings: jnp.ndarray,  # (B, N, C)
        dense_prompt_embeddings: jnp.ndarray,   # (B, H, W, C)
        high_res_features: tuple | None = None,
    ):
        s = 1 if self.pred_obj_scores else 0
        toks = [self.iou_token, self.mask_tokens]
        if self.pred_obj_scores:
            toks.insert(0, self.obj_score_token)
        output_tokens = jnp.concatenate(toks, axis=0).astype(self.dtype)
        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b, *output_tokens.shape)
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

        src = image_embeddings + dense_prompt_embeddings
        pos = jnp.broadcast_to(image_pe, src.shape)

        hs, src_out = self.transformer(src, pos, tokens)
        iou_token_out = hs[:, s, :]
        mask_tokens_out = hs[:, s + 1 : s + 1 + self.num_mask_tokens, :]

        bb, h, w, c = src.shape
        src_img = src_out.reshape(bb, h, w, c)
        if not self.use_high_res_features:
            up = self.upscale_conv1(src_img)
            up = gelu(self.upscale_ln(up))
            up = gelu(self.upscale_conv2(up))
        else:
            # high_res_features arrive already projected by conv_s0/conv_s1
            # in forward_image (sam2_base.py:466-474)
            feat_s0, feat_s1 = high_res_features  # NHWC
            up = self.upscale_conv1(src_img) + feat_s1
            up = gelu(self.upscale_ln(up))
            up = gelu(self.upscale_conv2(up) + feat_s0)

        hyper = jnp.stack(
            [m(mask_tokens_out[:, i]) for i, m in
             enumerate(self.output_hypernetworks_mlps)],
            axis=1,
        )  # (B, T, C/8)
        bu, hu, wu, cu = up.shape
        masks = jnp.einsum("btc,bhwc->bthw", hyper, up)

        iou_pred = self.iou_prediction_head(iou_token_out)
        if self.pred_obj_scores:
            object_score_logits = self.pred_obj_score_head(hs[:, 0, :])
        else:
            object_score_logits = 10.0 * jnp.ones((bu, 1), self.dtype)
        return masks, iou_pred, mask_tokens_out, object_score_logits

    def _stability_scores(self, mask_logits: jnp.ndarray) -> jnp.ndarray:
        flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
        d = self.dynamic_multimask_stability_delta
        ai = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
        au = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
        return jnp.where(au > 0, ai / au, 1.0)

    def _dynamic_multimask(self, all_masks, all_ious):
        """(mask_decoder.py:259-295), branch-free."""
        multi_logits = all_masks[:, 1:]
        multi_iou = all_ious[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        bidx = jnp.arange(all_masks.shape[0])
        best_logits = multi_logits[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]

        single_logits = all_masks[:, 0:1]
        single_iou = all_ious[:, 0:1]
        stable = (
            self._stability_scores(single_logits)
            >= self.dynamic_multimask_stability_thresh
        )
        masks = jnp.where(stable[..., None, None], single_logits, best_logits)
        ious = jnp.where(stable, single_iou, best_iou)
        return masks, ious

    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt_embeddings,
        dense_prompt_embeddings,
        multimask_output: bool,
        high_res_features=None,
        train: bool = False,
    ):
        masks, iou_pred, mask_tokens_out, object_score_logits = self.predict_masks(
            image_embeddings, image_pe, sparse_prompt_embeddings,
            dense_prompt_embeddings, high_res_features,
        )
        if multimask_output:
            masks = masks[:, 1:]
            iou_pred = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability and not train:
            masks, iou_pred = self._dynamic_multimask(masks, iou_pred)
        else:
            masks = masks[:, 0:1]
            iou_pred = iou_pred[:, 0:1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return masks, iou_pred, sam_tokens_out, object_score_logits
