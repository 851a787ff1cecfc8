"""Golden parity of ops/resize against torch.nn.functional semantics.

These gates keep converted checkpoints bitwise-close: the reference leans on
F.interpolate in the decoder (SAM2UNet.py:35,168-172), the pos-embed
(hieradet.py:271) and the eval path (train.py:108)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from sam2unet_tpu.ops.resize import resize
from sam2unet_tpu.ops.resize_np import resize_np


def _torch_resize(x_nchw, size, mode, align_corners=None, antialias=False):
    t = torch.from_numpy(x_nchw)
    if mode == "nearest":
        y = TF.interpolate(t, size=size, mode="nearest")
    else:
        y = TF.interpolate(t, size=size, mode=mode,
                           align_corners=align_corners, antialias=antialias)
    return y.numpy()


CASES = [
    # (in, out, mode, align_corners)
    ((22, 22), (44, 44), "bilinear", True),    # Up decoder 2x
    ((22, 22), (352, 352), "bilinear", False), # x16 head
    ((44, 44), (352, 352), "bilinear", False), # x8 head
    ((88, 88), (352, 352), "bilinear", False), # x4 head
    ((352, 352), (231, 317), "bilinear", False),  # eval downsize to GT
    ((7, 7), (88, 88), "bicubic", False),      # pos-embed background
    ((14, 14), (60, 60), "bicubic", False),
    ((13, 17), (29, 23), "bilinear", True),
    ((13, 17), (5, 9), "nearest", None),
]


@pytest.mark.parametrize("in_hw,out_hw,mode,ac", CASES)
def test_resize_matches_torch(in_hw, out_hw, mode, ac):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    ref = _torch_resize(x, out_hw, mode, ac)
    got = np.asarray(
        resize(np.transpose(x, (0, 2, 3, 1)), out_hw, mode, bool(ac))
    ).transpose(0, 3, 1, 2)
    # fp32 lerp associativity differs from torch's formulation -> ~1e-4 noise
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("out_hw", [(100, 100), (960, 720), (64, 96)])
def test_antialias_downscale_matches_torchvision(out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 473, 611)).astype(np.float32)
    ref = _torch_resize(x, out_hw, "bilinear", False, antialias=True)
    got = resize_np(x, out_hw, "bilinear", align_corners=False, antialias=True)
    # two fp32 passes compound ~8e-5/axis of weight-rounding noise
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-4)


def test_host_and_device_resize_agree():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, 37, 53)).astype(np.float32)
    a = resize_np(x, (80, 90), "bilinear")
    b = np.asarray(
        resize(np.transpose(x, (0, 2, 3, 1)), (80, 90), "bilinear")
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
