"""Video frame loading utilities (sync + async prefetch loaders)."""

import numpy as np
import pytest
from PIL import Image

from sam2unet_tpu.utils.video import AsyncVideoFrameLoader, load_video_frames


@pytest.fixture()
def frame_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.jpg")
    return tmp_path


def test_load_video_frames(frame_dir):
    frames, h, w = load_video_frames(str(frame_dir))
    assert frames.shape == (5, 24, 32, 3)
    assert (h, w) == (24, 32)
    # numeric-name ordering (misc.py frame-index contract)
    f0 = np.asarray(Image.open(frame_dir / "0.jpg").convert("RGB"))
    np.testing.assert_array_equal(frames[0], f0)


def test_async_loader(frame_dir):
    loader = AsyncVideoFrameLoader(str(frame_dir))
    assert len(loader) == 5
    assert loader.shape == (5, 24, 32, 3)
    # random access works regardless of background sweep progress
    frame = loader[3]
    assert frame.shape == (24, 32, 3)
    loader.thread.join(timeout=10)
    assert loader.exception is None
    for i in range(5):
        assert loader[i].shape == (24, 32, 3)


def test_empty_dir_raises(tmp_path):
    with pytest.raises(RuntimeError, match="no images"):
        load_video_frames(str(tmp_path))


def test_video_predictor_accepts_path(frame_dir):
    from sam2unet_tpu.build_sam import build_sam2
    from sam2unet_tpu.configs import HIERA_TEST
    from sam2unet_tpu.models.sam2_base import SAM2Config
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    cfg = SAM2Config(image_size=64, hidden_dim=64, mem_dim=16,
                     max_obj_ptrs_in_encoder=4)
    model, variables = build_sam2("hiera_test", sam2_config=cfg,
                                  trunk_cfg=HIERA_TEST)
    pred = SAM2VideoPredictor(model, variables)
    state = pred.init_state(video_path=str(frame_dir))
    assert state["num_frames"] == 5
    assert (state["video_height"], state["video_width"]) == (24, 32)

    # async loading (misc.py:104-160): same state contract, frames arrive
    # via the prefetching loader and full propagation works over it
    state_a = pred.init_state(video_path=str(frame_dir),
                              async_loading_frames=True)
    assert state_a["num_frames"] == 5
    assert (state_a["video_height"], state_a["video_width"]) == (24, 32)
    pred.add_new_points(
        state_a, frame_idx=0, obj_id=1,
        points=np.array([[16.0, 12.0]]), labels=np.array([1]),
    )
    outs = {f for f, _, _ in pred.propagate_in_video(state_a)}
    assert outs == {0, 1, 2, 3, 4}
