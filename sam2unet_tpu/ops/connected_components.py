"""Connected-component labeling (8-connectivity) — TPU-native + host native.

Replaces the reference's only native kernel, the CUDA block-union-find CCL
(sam2/csrc/connected_components.cu:20-289, `get_connected_componnets`),
with two equivalents sharing its contract:

    labels, counts = get_connected_components(mask)   # mask: (N, 1, H, W)

    labels: int32, same shape; 0 on background; foreground pixels carry a
            component id; all pixels of one component share one id.
    counts: int32, same shape; 0 on background; foreground pixels carry the
            area of their component.

  - Device path (`label_components_jax`): union-find is hostile to SIMD, so
    labeling runs as iterative min-label propagation — each step is a 3x3
    min-pool (one fused reduce_window) followed by a pointer-jumping hop
    `label <- label[label]` that squares the effective propagation distance,
    giving O(log(H*W)) convergence instead of O(diameter). The loop is a
    convergence-tested lax.while_loop (shapes static under jit; the trip
    count is dynamic but bounded).
  - Host path (`label_components_native`): two-pass union-find in C++
    (csrc/ccl.cc) via ctypes, built by `python -m sam2unet_tpu.ops.build_native`
    (scipy fallback when the shared library is absent).

Component ids differ between paths (raster-min vs first-seen) but the
partitions and counts are identical; `canonicalize_labels` renumbers to
first-seen order for exact cross-path comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _min_pool8(x: jnp.ndarray, big: jnp.ndarray) -> jnp.ndarray:
    """3x3 min over the 8-neighborhood + center, NHW layout, edge-safe."""
    return -lax.reduce_window(
        -x,
        -big,
        lax.max,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )


@functools.partial(jax.jit, static_argnames=("num_iters",))
def label_components_jax(
    mask: jnp.ndarray, num_iters: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mask: (N, 1, H, W) (uint8/bool/int). Returns (labels, counts) int32.

    num_iters: hard cap on propagation rounds (None -> H*W); the
    while_loop exits as soon as the labels stop changing, which pointer
    jumping reaches in ~log2(H*W) rounds for any component shape."""
    n, c, h, w = mask.shape
    assert c == 1, "expected (N, 1, H, W)"
    fg = (mask[:, 0] > 0)
    size = h * w
    if num_iters is None:
        num_iters = size  # safety cap; the while_loop exits on convergence

    big = jnp.int32(size)
    init = jnp.arange(size, dtype=jnp.int32).reshape(1, h, w)
    labels = jnp.where(fg, init, big)

    def step(labels):
        # local relaxation: adopt the smallest neighboring label
        prop = _min_pool8(labels, big)
        prop = jnp.where(fg, jnp.minimum(labels, prop), big)
        # pointer jumping: label <- label[label] (flat gather per image)
        flat = prop.reshape(n, size)
        safe = jnp.minimum(flat, size - 1)
        hopped = jnp.take_along_axis(flat, safe, axis=1)
        flat = jnp.where(flat < size, jnp.minimum(flat, hopped), flat)
        return flat.reshape(n, h, w)

    def cond(state):
        labels, changed, it = state
        return changed & (it < num_iters)

    def body(state):
        labels, _, it = state
        new = step(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0))
    )

    # areas via one-hot-free histogram: segment-sum over flat label ids
    flat = labels.reshape(n, size)
    ones = jnp.where(flat < size, 1, 0)
    hist = jax.vmap(
        lambda f, o: jnp.zeros((size + 1,), jnp.int32).at[f].add(o)
    )(flat, ones)
    counts = jnp.take_along_axis(hist, jnp.minimum(flat, size), axis=1)
    counts = jnp.where(flat < size, counts, 0).reshape(n, 1, h, w)

    labels = jnp.where(labels < size, labels + 1, 0).reshape(n, 1, h, w)
    return labels.astype(jnp.int32), counts.astype(jnp.int32)


# ------------------------------------------------------------- host native

_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    import ctypes

    from sam2unet_tpu.ops.native_lib import find_native_lib

    so = find_native_lib("libccl.so")
    if so is None:
        _native = False
        return False
    lib = ctypes.CDLL(so)
    lib.ccl_label_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.ccl_label_u8.restype = ctypes.c_int32
    _native = lib
    return lib


def label_components_native(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host CCL with the same (labels, counts) contract; C++ union-find via
    ctypes, scipy fallback."""
    import ctypes

    n, c, h, w = mask.shape
    assert c == 1
    m = np.ascontiguousarray(mask[:, 0].astype(np.uint8))
    labels = np.zeros((n, h, w), np.int32)
    counts = np.zeros((n, h, w), np.int32)

    lib = _load_native()
    # the C ABI carries pixel indices as int32 — gigapixel masks take the
    # scipy path instead of overflowing
    if lib and h * w <= 2**31 - 1:
        for i in range(n):
            lib.ccl_label_u8(
                m[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                labels[i].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                counts[i].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                h,
                w,
            )
    else:
        from scipy import ndimage

        s8 = np.ones((3, 3), np.int32)
        for i in range(n):
            lab, num = ndimage.label(m[i], structure=s8)
            labels[i] = lab
            if num:
                areas = np.bincount(lab.ravel(), minlength=num + 1)
                areas[0] = 0
                counts[i] = areas[lab]
    return labels[:, None], counts[:, None]


def canonicalize_labels(labels: np.ndarray) -> np.ndarray:
    """Renumber component ids to first-seen (raster) order, background 0."""
    labels = np.asarray(labels)
    out = np.zeros_like(labels, dtype=np.int32)
    for i in range(labels.shape[0]):
        flat = labels[i].ravel()
        remap: dict[int, int] = {}
        o = out[i].ravel()
        for j, val in enumerate(flat):
            if val == 0:
                continue
            if val not in remap:
                remap[val] = len(remap) + 1
            o[j] = remap[val]
    return out


def get_connected_components(mask) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for the reference `_C.get_connected_componnets`
    (sam2/utils/misc.py:47-63): device path under jit, batched."""
    return label_components_jax(jnp.asarray(mask))
