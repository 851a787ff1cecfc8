"""Prompt encoder: points/boxes/masks -> sparse/dense embeddings.

JAX re-design of sam2/modeling/sam/prompt_encoder.py:17-182. Differences
forced by jit: optional prompts are expressed with the reference's own
padding convention (label -1 = padding point) instead of Python None
branching, so one compiled program covers every prompt combination. Point
labels: -1 pad, 0 negative, 1 positive, 2/3 box corners.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sam2unet_tpu.models.position_encoding import random_pe_coords, random_pe_grid
from sam2unet_tpu.nn.layers import gelu


class PromptEncoder(nn.Module):
    embed_dim: int
    image_embedding_size: tuple[int, int]
    input_image_size: tuple[int, int]
    mask_in_chans: int
    dtype: jnp.dtype = jnp.float32

    @property
    def mask_input_size(self) -> tuple[int, int]:
        return (4 * self.image_embedding_size[0], 4 * self.image_embedding_size[1])

    def setup(self):
        f = self.embed_dim // 2
        self.pe_gaussian = self.param(
            "pe_layer_positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, f),
        )
        init = nn.initializers.normal(1.0)
        self.point_embeddings = [
            self.param(f"point_embeddings_{i}", init, (1, self.embed_dim))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", init, (1, self.embed_dim)
        )
        self.no_mask_embed = self.param("no_mask_embed", init, (1, self.embed_dim))

        c4 = self.mask_in_chans // 4
        self.mask_down_conv1 = nn.Conv(c4, (2, 2), strides=2, dtype=self.dtype,
                                       name="mask_downscaling_layers_0")
        self.mask_down_ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                          name="mask_downscaling_layers_1")
        self.mask_down_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=2,
                                       dtype=self.dtype,
                                       name="mask_downscaling_layers_3")
        self.mask_down_ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                          name="mask_downscaling_layers_4")
        self.mask_down_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                       name="mask_downscaling_layers_6")

    def get_dense_pe(self) -> jnp.ndarray:
        """(1, H, W, C) grid PE (prompt_encoder.py:68-77)."""
        h, w = self.image_embedding_size
        return random_pe_grid(self.pe_gaussian, h, w)[None]

    def embed_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points: (B, N, 2) pixel coords; labels: (B, N) in {-1,0,1,2,3}.
        (prompt_encoder.py:79-101; caller appends the pad point when no box
        is present, matching `pad=(boxes is None)`)."""
        pts = (points + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        pe = random_pe_coords(self.pe_gaussian, pts)
        out = jnp.where((labels == -1)[..., None], self.not_a_point_embed, pe)
        for i in range(4):
            out = out + jnp.where(
                (labels == i)[..., None], self.point_embeddings[i], 0.0
            )
        return out.astype(self.dtype)

    def embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """boxes: (B, 4) xyxy -> (B, 2, C) corner embeddings
        (prompt_encoder.py:103-112)."""
        coords = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        pe = random_pe_coords(self.pe_gaussian, coords)
        pe = pe.at[:, 0].add(self.point_embeddings[2][0])
        pe = pe.at[:, 1].add(self.point_embeddings[3][0])
        return pe.astype(self.dtype)

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """masks: (B, 4H, 4W, 1) -> (B, H, W, C) (prompt_encoder.py:57-65)."""
        x = self.mask_down_conv1(masks)
        x = gelu(self.mask_down_ln1(x))
        x = self.mask_down_conv2(x)
        x = gelu(self.mask_down_ln2(x))
        return self.mask_down_conv3(x)

    def dense_no_mask(self, batch: int) -> jnp.ndarray:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1), (batch, h, w, self.embed_dim)
        ).astype(self.dtype)

    def __call__(self, points, labels, boxes=None, masks=None):
        """Combined forward (prompt_encoder.py:140-182): returns
        (sparse (B, N[+2], C), dense (B, H, W, C))."""
        sparse = self.embed_points(points, labels)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self.embed_boxes(boxes)], axis=1)
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.dense_no_mask(points.shape[0])
        return sparse, dense
