#!/usr/bin/env python
"""Visual-inspection dump of the train augmentation pipeline — the analog of
the reference dataset.py __main__ (dataset.py:450-488): writes N augmented
image/label pairs to a result directory.

Usage: python scripts/dump_augmentations.py --image_path ... --mask_path ...
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", required=True)
    p.add_argument("--mask_path", required=True)
    p.add_argument("--out", default="result")
    p.add_argument("--size", type=int, default=960)
    p.add_argument("--count", type=int, default=100)
    args = p.parse_args()

    from PIL import Image

    from sam2unet_tpu.data.dataset import TrainDataset
    from sam2unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    os.makedirs(args.out, exist_ok=True)
    ds = TrainDataset(args.image_path, args.mask_path, args.size)
    n = min(args.count, len(ds))
    for i in range(n):
        img, lbl = ds.sample(i % len(ds), rng_seed=i)
        # denormalize for viewing (dataset.py:468-471)
        img = img * IMAGENET_STD[:, None, None] + IMAGENET_MEAN[:, None, None]
        img = np.clip(img.transpose(1, 2, 0), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(args.out, f"{i}.jpg")
        )
        Image.fromarray(
            (np.clip(lbl[0], 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(args.out, f"label_{i}.png"))
        print(i, img.shape, float(img.max()), float(lbl.max()))


if __name__ == "__main__":
    main()
