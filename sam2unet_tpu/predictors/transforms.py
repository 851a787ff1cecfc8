"""SAM2 input/output transforms (sam2/utils/transforms.py:13-99).

Square resize + ImageNet normalize on the host (numpy), coordinate/box
mapping to model resolution, and mask postprocessing (hole/sprinkle filling
via the framework's connected-components op + bilinear resize to the
original resolution)."""

from __future__ import annotations

import numpy as np

from sam2unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from sam2unet_tpu.ops.connected_components import label_components_native
from sam2unet_tpu.ops.resize_np import resize_np


class SAM2Transforms:
    def __init__(self, resolution: int, mask_threshold: float = 0.0,
                 max_hole_area: float = 0.0, max_sprinkle_area: float = 0.0):
        self.resolution = resolution
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """HWC uint8/float [0,255] -> (res, res, 3) float32 normalized."""
        img = np.asarray(image, np.float32) / 255.0
        chw = img.transpose(2, 0, 1)
        chw = resize_np(chw, (self.resolution, self.resolution), "bilinear",
                        antialias=True)
        chw = (chw - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
        return chw.transpose(1, 2, 0)

    def forward_batch(self, images: list[np.ndarray]) -> np.ndarray:
        return np.stack([self(im) for im in images], axis=0)

    def transform_coords(self, coords: np.ndarray, normalize=False,
                         orig_hw=None) -> np.ndarray:
        coords = np.asarray(coords, np.float32).copy()
        if normalize:
            h, w = orig_hw
            coords[..., 0] = coords[..., 0] / w
            coords[..., 1] = coords[..., 1] / h
        return coords * self.resolution

    def transform_boxes(self, boxes: np.ndarray, normalize=False,
                        orig_hw=None) -> np.ndarray:
        return self.transform_coords(
            np.asarray(boxes).reshape(-1, 2, 2), normalize, orig_hw
        )

    def postprocess_masks(self, masks: np.ndarray, orig_hw) -> np.ndarray:
        """masks: (B, M, h, w) logits -> (B, M, H, W) at original res, with
        optional hole/sprinkle filling (transforms.py:74-99)."""
        masks = np.asarray(masks, np.float32)
        b, m, h, w = masks.shape
        flat = masks.reshape(b * m, 1, h, w)
        if self.max_hole_area > 0:
            labels, areas = label_components_native(
                (flat <= self.mask_threshold).astype(np.uint8)
            )
            is_hole = (labels > 0) & (areas <= self.max_hole_area)
            flat = np.where(is_hole, self.mask_threshold + 10.0, flat)
        if self.max_sprinkle_area > 0:
            labels, areas = label_components_native(
                (flat > self.mask_threshold).astype(np.uint8)
            )
            is_spr = (labels > 0) & (areas <= self.max_sprinkle_area)
            flat = np.where(is_spr, self.mask_threshold - 10.0, flat)
        masks = flat.reshape(b, m, h, w)
        return resize_np(masks, tuple(orig_hw), "bilinear")
