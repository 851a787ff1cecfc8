"""Datasets + a threaded prefetching loader (host side).

Mirrors the reference's data contracts:
  - TrainDataset ~ FullDataset (dataset.py:288-333): sorted .jpg/.png images
    and .png masks, augmented pairs.
  - EvalDataset ~ TestDataset (dataset.py:405-447): deterministic letterbox
    with padding metadata, returns (image, gt, name, padding).

TPU-native differences: samples are collated into fixed-shape NHWC batches
(static shapes for jit; the last batch is padded and flagged via
`valid` counts), and prefetch uses a thread pool feeding a bounded queue
(numpy releases the GIL) instead of torch worker processes.
"""

from __future__ import annotations

import os
import queue
import threading
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
from PIL import Image

from sam2unet_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    TrainAugment,
    letterbox,
    normalize,
)


def _list_pairs(image_root: str, gt_root: str) -> tuple[list[str], list[str]]:
    images = sorted(
        os.path.join(image_root, f)
        for f in os.listdir(image_root)
        if f.endswith((".jpg", ".png"))
    )
    gts = sorted(
        os.path.join(gt_root, f) for f in os.listdir(gt_root) if f.endswith(".png")
    )
    return images, gts


def _native_loader():
    """csrc/dataload.cc bridge, or None (unbuilt / disabled via env)."""
    if os.environ.get("SAM2UNET_NO_NATIVE_LOADER"):
        return None
    from sam2unet_tpu.data import native_loader

    return native_loader if native_loader.available() else None


def load_rgb(path: str) -> np.ndarray:
    """(3, H, W) float32 in [0,1]."""
    nl = _native_loader()
    if nl is not None and path.endswith(".jpg"):
        rgb = nl.decode_jpeg(path)  # same libjpeg pixels as PIL
        if rgb is not None:
            return rgb.astype(np.float32).transpose(2, 0, 1) / 255.0
    with open(path, "rb") as f:
        img = Image.open(f).convert("RGB")
    return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0


def load_gray(path: str) -> np.ndarray:
    """(1, H, W) float32 in [0,1]."""
    with open(path, "rb") as f:
        img = Image.open(f).convert("L")
    return np.asarray(img, np.float32)[None] / 255.0


@dataclass
class Batch:
    image: np.ndarray  # (B, H, W, 3) normalized
    label: np.ndarray  # (B, H, W, 1) in {0,1}
    valid: int         # number of real samples (rest are pad)


class TrainDataset:
    def __init__(self, image_root: str, gt_root: str, size: int, seed: int = 0):
        self.images, self.gts = _list_pairs(image_root, gt_root)
        if len(self.images) != len(self.gts):
            raise ValueError(
                f"image/mask count mismatch: {len(self.images)} vs {len(self.gts)}"
            )
        self.size = size
        self.seed = seed

    def __len__(self) -> int:
        return len(self.images)

    def sample(self, idx: int, rng_seed: int) -> tuple[np.ndarray, np.ndarray]:
        aug = TrainAugment(self.size, seed=rng_seed)
        image = load_rgb(self.images[idx])
        label = load_gray(self.gts[idx])
        img, lbl = aug(image, label)
        return img, lbl

    def epoch(
        self,
        batch_size: int,
        epoch: int = 0,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = False,
    ) -> Iterator[Batch]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        if drop_last:
            order = order[: (len(order) // batch_size) * batch_size]

        def produce(idx: int):
            img, lbl = self.sample(int(idx), rng_seed=self.seed * 1_000_003 + epoch * 65_537 + int(idx))
            return img, lbl

        yield from _batched_prefetch(
            order, produce, batch_size, self.size, num_workers
        )


class EvalDataset:
    """Deterministic letterbox inference inputs + ground truth."""

    def __init__(self, image_root: str, gt_root: str, size: int):
        self.images, self.gts = _list_pairs(image_root, gt_root)
        if len(self.images) != len(self.gts):
            # fail fast: a shifted sorted pairing silently scores every
            # image after the gap against the wrong mask
            raise ValueError(
                f"image/gt count mismatch: {len(self.images)} vs "
                f"{len(self.gts)}"
            )
        self.size = size
        self.index = 0

    @property
    def count(self) -> int:
        return len(self.images)

    def reset_index(self) -> None:
        self.index = 0

    def item(self, i: int):
        """(image (1,S,S,3) normalized NHWC, gt (H,W) float, name, padding)."""
        path = self.images[i]
        name = os.path.basename(path)
        gt = np.asarray(Image.open(self.gts[i]).convert("L"), np.float32)
        nl = _native_loader()
        if nl is not None and path.endswith(".jpg"):
            rgb = nl.decode_jpeg(path)
            if rgb is not None:
                # fused native decode+letterbox+normalize (identical taps)
                hwc, padding = nl.letterbox_norm(rgb, self.size)
                return hwc[None], gt, name, padding
        img = load_rgb(path)
        padded, padding = letterbox(img, self.size)
        padded = normalize(padded, IMAGENET_MEAN, IMAGENET_STD)
        return padded.transpose(1, 2, 0)[None], gt, name, padding

    def load_data(self):
        """Sequential-iteration API of the reference TestDataset
        (dataset.py:424-437)."""
        out = self.item(self.index)
        self.index += 1
        return out

    def batches(self, batch_size: int, letterbox_gt: bool = False) -> Iterator[dict]:
        """Fixed-shape batches for sharded eval; pads the tail batch.
        letterbox_gt=True additionally letterboxes the GT to model
        resolution (nearest) for device-side metric computation."""
        n = self.count
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            images = np.zeros((batch_size, self.size, self.size, 3), np.float32)
            paddings = np.zeros((batch_size, 4), np.int32)
            gts, names = [], []
            gt_lb = (
                np.zeros((batch_size, self.size, self.size), np.float32)
                if letterbox_gt else None
            )
            for j, i in enumerate(idxs):
                img, gt, name, padding = self.item(i)
                images[j] = img[0]
                paddings[j] = padding
                gts.append(gt)
                names.append(name)
                if letterbox_gt:
                    from sam2unet_tpu.data.transforms import letterbox_nearest

                    gt_lb[j] = letterbox_nearest(gt[None], self.size)[0]
            out = {
                "image": images,
                "padding": paddings,
                "gt": gts,
                "name": names,
                "valid": len(idxs),
            }
            if letterbox_gt:
                out["gt_letterboxed"] = gt_lb
            yield out


def _batched_prefetch(order, produce, batch_size, size, num_workers):
    """Thread-pool sample production feeding a bounded batch queue."""
    from concurrent.futures import ThreadPoolExecutor

    n = len(order)
    out_q: queue.Queue = queue.Queue(maxsize=4)
    # set when the consumer abandons the generator: without it the producer
    # would block forever on a full queue, leaking the thread, its pool, and
    # up to maxsize+1 in-flight fp32 batches per abandoned epoch
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        # any failure (corrupt image, missing file) must reach the consumer:
        # the torch DataLoader this replaces propagates worker exceptions,
        # and a silently dead producer would hang the training loop forever
        # on out_q.get()
        try:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                for start in range(0, n, batch_size):
                    if stop.is_set():
                        return
                    idxs = order[start : start + batch_size]
                    results = list(pool.map(produce, idxs))
                    b = len(results)
                    images = np.zeros((batch_size, size, size, 3), np.float32)
                    labels = np.zeros((batch_size, size, size, 1), np.float32)
                    for j, (img, lbl) in enumerate(results):
                        images[j] = img.transpose(1, 2, 0)
                        labels[j] = lbl.transpose(1, 2, 0)
                    # wrap-fill the ragged tail so every compiled step sees
                    # the same static batch shape (pads are real samples
                    # repeated — a mild oversampling, vs torch's variable
                    # last batch)
                    for j in range(b, batch_size):
                        images[j] = images[j % b]
                        labels[j] = labels[j % b]
                    if not put(Batch(images, labels, valid=b)):
                        return
            put(None)
        except BaseException as e:  # noqa: BLE001 - forwarded, not swallowed
            put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = out_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        t.join()
