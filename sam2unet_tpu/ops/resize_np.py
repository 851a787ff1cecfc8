"""Interpolation weight matrices with exact PyTorch coordinate semantics.

Design: instead of gather-based samplers (poor fit for the TPU vector unit),
every 1-D resize is expressed as a dense matrix ``R`` of shape (out, in) so a
2-D image resize is two matmuls — `R_h @ x @ R_w^T` — which XLA tiles straight
onto the MXU. The matrices are built here in numpy at trace time (shapes are
static under jit) and shared by the host-side data pipeline.

Semantics replicated (so converted checkpoints stay bitwise-close):
  - ``bilinear`` / ``bicubic`` with align_corners True/False, matching
    torch.nn.functional.interpolate (bicubic uses A=-0.75, torch's kernel).
  - ``nearest`` matching torch's legacy floor rule.
  - ``antialias=True`` triangle/cubic filters matching torchvision/PIL
    downsampling (used by the reference's letterbox: dataset.py:117-123).

Reference behaviors covered: SAM2UNet.py:168-172 (x16/x8/x4 bilinear heads),
SAM2UNet.py:35 (align_corners=True decoder upsample), hieradet.py:271
(bicubic pos-embed), dataset.py:117-123 + 373 (letterbox resize).
"""

from __future__ import annotations

import functools

import numpy as np

_A = -0.75  # torch's bicubic convolution constant


def _source_index(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """Map output pixel centers to input coordinates, torch rules."""
    d = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(1, dtype=np.float64)
        return d * (in_size - 1) / (out_size - 1)
    scale = in_size / out_size
    return (d + 0.5) * scale - 0.5


def _cubic_kernel(x: np.ndarray, a: float = _A) -> np.ndarray:
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(
    in_size: int,
    out_size: int,
    method: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
) -> np.ndarray:
    """Dense (out_size, in_size) float32 resize matrix, rows sum to 1."""
    if method == "nearest":
        # torch mode="nearest": src = floor(d * in/out)
        idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
        idx = np.minimum(idx, in_size - 1)
        mat = np.zeros((out_size, in_size), dtype=np.float64)
        mat[np.arange(out_size), idx] = 1.0
        return mat.astype(np.float32)

    src = _source_index(out_size, in_size, align_corners)
    mat = np.zeros((out_size, in_size), dtype=np.float64)

    downscale = in_size / out_size if out_size < in_size else 1.0
    use_aa = antialias and downscale > 1.0

    if method == "bilinear":
        if use_aa:
            support = downscale  # triangle filter stretched by the scale
            for o in range(out_size):
                c = src[o]
                lo = int(np.floor(c - support)) + 1
                hi = int(np.floor(c + support)) + 1
                taps = np.arange(lo, hi)
                w = np.maximum(0.0, 1.0 - np.abs((taps - c) / downscale))
                # torch/PIL drop out-of-range taps and renormalize (they do
                # NOT accumulate them onto the border pixel)
                valid = (taps >= 0) & (taps < in_size)
                np.add.at(mat[o], taps[valid], w[valid])
            mat /= mat.sum(axis=1, keepdims=True)
        else:
            s = np.maximum(src, 0.0) if not align_corners else src
            i0 = np.floor(s).astype(np.int64)
            i0 = np.clip(i0, 0, in_size - 1)
            i1 = np.minimum(i0 + 1, in_size - 1)
            t = s - i0
            for o in range(out_size):
                mat[o, i0[o]] += 1.0 - t[o]
                mat[o, i1[o]] += t[o]
    elif method == "bicubic":
        if use_aa:
            support = 2.0 * downscale
            for o in range(out_size):
                c = src[o]
                lo = int(np.floor(c - support)) + 1
                hi = int(np.floor(c + support)) + 1
                taps = np.arange(lo, hi)
                w = _cubic_kernel((taps - c) / downscale)
                valid = (taps >= 0) & (taps < in_size)
                np.add.at(mat[o], taps[valid], w[valid])
            mat /= mat.sum(axis=1, keepdims=True)
        else:
            i0 = np.floor(src).astype(np.int64)
            t = src - i0
            for o in range(out_size):
                taps = i0[o] + np.array([-1, 0, 1, 2])
                w = _cubic_kernel(np.array([1.0 + t[o], t[o], 1.0 - t[o], 2.0 - t[o]]))
                taps = np.clip(taps, 0, in_size - 1)
                np.add.at(mat[o], taps, w)
    else:
        raise ValueError(f"unknown resize method: {method}")

    return mat.astype(np.float32)


def resize_np(
    x: np.ndarray,
    size: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
) -> np.ndarray:
    """Host-side resize of an (..., H, W) array with torch semantics."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = size
    rh = resize_matrix(h, oh, method, align_corners, antialias)
    rw = resize_matrix(w, ow, method, align_corners, antialias)
    y = np.einsum("oh,...hw->...ow", rh.astype(np.float64), x.astype(np.float64))
    y = np.einsum("pw,...ow->...op", rw.astype(np.float64), y)
    return y.astype(np.float32)
