"""ctypes bridge to the native data-loading kernels (csrc/dataload.cc).

JPEG decode via libjpeg plus a fused letterbox+normalize whose resize taps
come from ops/resize_np.py — the exact same weights as the Python path, so
the native pipeline is numerically interchangeable (tested to ~1e-6).

The hot entry points release the GIL (plain ctypes calls), so the existing
thread-pool prefetcher scales across cores without C-side thread plumbing.
Everything degrades gracefully: `available()` is False when the .so isn't
built, and callers fall back to the PIL path.

Replaces the role of torchvision/PIL in the reference's host pipeline
(dataset.py:288-447); built by `python -m sam2unet_tpu.ops.build_native`.
"""

from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

from sam2unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from sam2unet_tpu.ops.resize_np import _taps

_I32P = ctypes.POINTER(ctypes.c_int32)
_F32P = ctypes.POINTER(ctypes.c_float)
_U8P = ctypes.POINTER(ctypes.c_uint8)


@functools.lru_cache(maxsize=1)
def _lib():
    from sam2unet_tpu.ops.native_lib import find_native_lib

    path = find_native_lib("libdataload.so")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.dl_jpeg_info.argtypes = [_U8P, ctypes.c_size_t,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.dl_jpeg_decode.argtypes = [_U8P, ctypes.c_size_t, _U8P, ctypes.c_int]
    lib.dl_letterbox_norm.argtypes = (
        [_U8P] + [ctypes.c_int] * 2
        + [_I32P, _F32P, ctypes.c_int, ctypes.c_int] * 2
        + [ctypes.c_int] * 3 + [_F32P, _F32P, _F32P]
    )
    for fn in (lib.dl_jpeg_info, lib.dl_jpeg_decode,
               lib.dl_letterbox_norm):
        fn.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(_U8P)


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(_F32P)


def decode_jpeg(path: str) -> np.ndarray | None:
    """(H, W, 3) uint8 RGB, or None if the file isn't a decodable JPEG."""
    lib = _lib()
    if lib is None:
        return None
    buf = np.fromfile(path, np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.dl_jpeg_info(_u8p(buf), buf.size, ctypes.byref(h),
                        ctypes.byref(w)) != 0:
        return None
    if h.value * w.value * 3 > 2**31 - 1:
        # the C ABI carries sizes as int32; a (possibly corrupt) header
        # declaring a >700 Mpx image must fall back to PIL, not overflow
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.dl_jpeg_decode(_u8p(buf), buf.size, _u8p(out), out.size) != 0:
        return None
    return out


@functools.lru_cache(maxsize=512)
def _taps_c(in_size: int, out_size: int, method: str, antialias: bool):
    """Contiguous int32/float32 taps for the C ABI (cached per geometry)."""
    idx, w = _taps(in_size, out_size, method, False, antialias)
    return (np.ascontiguousarray(idx, np.int32),
            np.ascontiguousarray(w, np.float32))


_MEAN = np.ascontiguousarray(IMAGENET_MEAN, np.float32)
_STD = np.ascontiguousarray(IMAGENET_STD, np.float32)


def letterbox_norm(rgb: np.ndarray, size: int):
    """uint8 (H, W, 3) -> (fp32 (size, size, 3) NHWC normalized, padding).

    Same geometry/weights as data/transforms.py::letterbox(antialias=True)
    followed by normalize(); padding is (left, top, right, bottom)."""
    lib = _lib()
    assert lib is not None
    h, w = rgb.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    pad_h, pad_w = size - nh, size - nw
    top, left = pad_h // 2, pad_w // 2
    ih, wh = _taps_c(h, nh, "bilinear", True)
    iw, ww = _taps_c(w, nw, "bilinear", True)
    # the Python path normalizes AFTER zero-padding, so pad pixels carry
    # (0 - mean) / std, not 0
    out = np.empty((size, size, 3), np.float32)
    out[:] = (0.0 - _MEAN) / _STD
    rgb = np.ascontiguousarray(rgb)
    rc = lib.dl_letterbox_norm(
        _u8p(rgb), h, w,
        ih.ctypes.data_as(_I32P), _f32p(wh), nh, ih.shape[1],
        iw.ctypes.data_as(_I32P), _f32p(ww), nw, iw.shape[1],
        size, top, left, _f32p(_MEAN), _f32p(_STD), _f32p(out),
    )
    if rc != 0:
        raise RuntimeError(f"dl_letterbox_norm failed ({rc})")
    return out, (left, top, pad_w - left, pad_h - top)
