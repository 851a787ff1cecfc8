"""Native data-loading kernels (csrc/dataload.cc) vs the PIL/numpy path.

The native pipeline must be numerically interchangeable: identical libjpeg
pixels for decode, and the SAME resize taps (ops/resize_np.py) for the
fused letterbox+normalize — so eval outputs do not depend on which path
served an image."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from sam2unet_tpu.data import native_loader
from sam2unet_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    letterbox,
    normalize,
)

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason="libdataload.so not built (python -m sam2unet_tpu.ops.build_native)",
)


def _jpeg_file(tmp_path, h=277, w=401, seed=0, name="img.jpg"):
    rng = np.random.default_rng(seed)
    # smooth-ish content so JPEG round-trips deterministically
    yy, xx = np.mgrid[:h, :w]
    img = np.stack(
        [
            (127 + 80 * np.sin(yy / 23) + 40 * np.cos(xx / 17)),
            (127 + 60 * np.cos(yy / 31)),
            (rng.random((h, w)) * 60 + 90),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    p = tmp_path / name
    Image.fromarray(img).save(p, quality=92)
    return str(p)


def test_decode_matches_pil(tmp_path):
    p = _jpeg_file(tmp_path)
    got = native_loader.decode_jpeg(p)
    want = np.asarray(Image.open(p).convert("RGB"))
    # both decoders are libjpeg with the default ISLOW IDCT
    np.testing.assert_array_equal(got, want)


def test_decode_rejects_non_jpeg(tmp_path):
    p = tmp_path / "not.jpg"
    p.write_bytes(b"definitely not a jpeg")
    assert native_loader.decode_jpeg(str(p)) is None


def test_letterbox_norm_matches_python_path(tmp_path):
    p = _jpeg_file(tmp_path, h=233, w=377)
    rgb = native_loader.decode_jpeg(p)
    got, padding = native_loader.letterbox_norm(rgb, 352)

    chw = rgb.astype(np.float32).transpose(2, 0, 1) / 255.0
    padded, want_padding = letterbox(chw, 352)
    want = normalize(padded, IMAGENET_MEAN, IMAGENET_STD).transpose(1, 2, 0)

    assert padding == tuple(want_padding)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_letterbox_norm_square_and_tall(tmp_path):
    for h, w in [(352, 352), (500, 120)]:
        p = _jpeg_file(tmp_path, h=h, w=w, name=f"s{h}x{w}.jpg")
        rgb = native_loader.decode_jpeg(p)
        got, padding = native_loader.letterbox_norm(rgb, 352)
        assert got.shape == (352, 352, 3)
        left, top, right, bottom = padding
        assert left + right + round(w * 352 / max(h, w)) == 352 or w >= h
        # padding regions are exactly the normalized-zero value
        if left > 0:
            np.testing.assert_allclose(
                got[:, 0],
                np.broadcast_to((0 - IMAGENET_MEAN) / IMAGENET_STD, (352, 3)),
                atol=1e-6,
            )


def test_eval_dataset_uses_native_and_matches_pil(tmp_path, monkeypatch):
    (tmp_path / "im").mkdir()
    (tmp_path / "gt").mkdir()
    _jpeg_file(tmp_path / "im", h=300, w=220, name="a.jpg")
    Image.fromarray((np.eye(8, dtype=np.uint8) * 255)).resize((220, 300)).save(
        tmp_path / "gt" / "a.png"
    )
    from sam2unet_tpu.data.dataset import EvalDataset

    ds = EvalDataset(str(tmp_path / "im"), str(tmp_path / "gt"), 352)
    img_native, gt, name, pad = ds.item(0)
    monkeypatch.setenv("SAM2UNET_NO_NATIVE_LOADER", "1")
    img_pil, _, _, pad_pil = ds.item(0)
    assert pad == tuple(pad_pil) or tuple(pad) == tuple(pad_pil)
    np.testing.assert_allclose(img_native, img_pil, rtol=0, atol=2e-5)


def test_native_decode_throughput(tmp_path):
    """Prints native-vs-python pipeline timing; no wall-clock assertion
    (shared machines make timing thresholds flaky — same-session A/B in
    docs/PERF.md is the perf record)."""
    paths = [_jpeg_file(tmp_path, h=480, w=640, seed=i, name=f"t{i}.jpg")
             for i in range(8)]

    t0 = time.perf_counter()
    for p in paths:
        rgb = native_loader.decode_jpeg(p)
        native_loader.letterbox_norm(rgb, 352)
    native_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for p in paths:
        chw = np.asarray(Image.open(p).convert("RGB"), np.float32)
        chw = chw.transpose(2, 0, 1) / 255.0
        padded, _ = letterbox(chw, 352)
        normalize(padded, IMAGENET_MEAN, IMAGENET_STD)
    pil_s = time.perf_counter() - t0

    print(f"native {native_s * 1e3:.1f} ms vs python {pil_s * 1e3:.1f} ms")
