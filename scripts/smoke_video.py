"""Video-predictor smoke on real hardware: init state on synthetic frames,
add point + box + mask prompts, propagate forward and reverse, and check
the interactive return path (video-resolution consolidation) composes
multiple objects at the ORIGINAL frame resolution.

Usage: python scripts/smoke_video.py [--frames 6] [--size 512]
(size is the model input; frames are 240x320 to exercise the resize path).
"""
import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--model_cfg", default="sam2_hiera_t")
    args = ap.parse_args()

    from sam2unet_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from sam2unet_tpu.build_sam import build_sam2_video_predictor
    from sam2unet_tpu.models.sam2_base import SAM2Config

    rng = np.random.default_rng(0)
    h, w = 240, 320
    frames = []
    for t in range(args.frames):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        yy, xx = np.mgrid[:h, :w]
        cx = 80 + 20 * t
        img[((yy - 120) ** 2 + (xx - cx) ** 2) < 40**2] = 230
        img[((yy - 60) ** 2 + (xx - (w - cx)) ** 2) < 30**2] = 25
        frames.append(img)
    frames = np.stack(frames)

    t0 = time.time()
    pred = build_sam2_video_predictor(
        args.model_cfg, sam2_config=SAM2Config(image_size=args.size)
    )
    state = pred.init_state(images=frames)
    print(f"init {time.time() - t0:.1f}s  video {h}x{w} model {args.size}")

    # obj 1: positive point on the bright disc; obj 2: point on the dark disc
    _, ids, masks = pred.add_new_points(
        state, frame_idx=0, obj_id=1,
        points=[[80, 120]], labels=[1],
    )
    assert masks.shape[-2:] == (h, w), masks.shape
    _, ids, masks = pred.add_new_points(
        state, frame_idx=0, obj_id=2,
        points=[[w - 80, 60]], labels=[1],
    )
    assert masks.shape[-2:] == (h, w), masks.shape
    assert list(ids) == [1, 2], ids
    assert np.isfinite(np.asarray(masks, np.float32)).all()
    a1 = (masks[0, 0] > 0).sum()
    a2 = (masks[1, 0] > 0).sum()
    # areas may be 0 with random-init weights (obj-score gating) — the check
    # here is that the video-res consolidation/resize path runs and is finite
    print(f"interactive return: 2 objs at video res, areas {a1} {a2}")

    # obj 2 refined with a mask prompt at video resolution
    m = np.zeros((h, w), bool)
    m[25:95, w - 115 : w - 45] = True
    _, ids, masks = pred.add_new_mask(state, frame_idx=0, obj_id=2, mask=m)
    assert masks.shape[-2:] == (h, w)
    print(f"mask prompt ok, areas {[int((mm[0] > 0).sum()) for mm in masks]}")

    t0 = time.time()
    areas, times = [], []
    for fidx, ids, masks in pred.propagate_in_video(state):
        assert masks.shape[-2:] == (h, w)
        areas.append([fidx] + [int((mm[0] > 0).sum()) for mm in masks])
        times.append(time.time() - t0)
        t0 = time.time()
    per_frame = " ".join(f"{t:.2f}" for t in times)
    print(f"forward per-frame s: {per_frame}")
    print(f"areas {areas}")
    assert len(areas) == args.frames

    # reverse from a MID-video start (reverse from frame 0 would yield
    # nothing — all prompts sit on frame 0); this actually re-tracks
    # frames mid..0 through the reverse gather-meta/ring path
    rev_start = args.frames // 2
    t0 = time.time()
    rev = [
        f for f, _, _ in pred.propagate_in_video(
            state, start_frame_idx=rev_start, reverse=True
        )
    ]
    print(f"reverse from {rev_start}: {time.time() - t0:.1f}s frames {rev}")
    assert rev == list(range(rev_start, -1, -1)), rev

    # packed-yield A/B: fully materialize the masks each frame (readback
    # included), float path vs bit-packed path. Each propagate call
    # RE-TRACKS every non-input frame (reference semantics — only frames
    # with fresh clicks are served from cache), so both drains exercise
    # the real device tracking + readback path, not cached outputs.
    def drain(**kw):
        t0 = time.time()
        times = []
        for _, _, m in pred.propagate_in_video(state, **kw):
            np.asarray(m)
            times.append(time.time() - t0)
            t0 = time.time()
        return times

    drain()  # warm any compiles
    tf_ = drain()
    tp_ = drain(yield_packed_masks=True)
    print(f"readback A/B steady median: float {np.median(tf_[2:]):.3f}s "
          f"packed {np.median(tp_[2:]):.3f}s per frame")
    print("SMOKE OK")


if __name__ == "__main__":
    main()
