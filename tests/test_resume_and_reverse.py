"""Full-resume checkpoint round trip + video reverse tracking."""

import numpy as np

from sam2unet_tpu.configs import HIERA_TEST, SAM2UNetConfig
from sam2unet_tpu.models.sam2unet import SAM2UNet
from sam2unet_tpu.train.checkpoints import (
    restore_train_state,
    restore_variables,
    save_train_state,
    save_variables,
)
from sam2unet_tpu.train.engine import create_train_state, make_train_step
from sam2unet_tpu.train.optim import make_optimizer


def test_train_state_resume_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    model = SAM2UNet(SAM2UNetConfig(trunk=HIERA_TEST, rfb_out=8))
    x = jnp.zeros((2, 64, 64, 3))
    y = jnp.zeros((2, 64, 64, 1))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    opt = make_optimizer(lr=1e-3, epochs=4, steps_per_epoch=1)
    state = create_train_state(variables, opt)
    step = make_train_step(model, opt, donate=False)
    state, _ = step(state, x, y)
    state, _ = step(state, x, y)

    path = tmp_path / "full_state"
    save_train_state(str(path), state)

    template = create_train_state(variables, opt)
    restored = restore_train_state(str(path), template)
    assert int(restored.step) == 2
    for k in state.trainable:
        np.testing.assert_array_equal(
            np.asarray(restored.trainable[k]), np.asarray(state.trainable[k])
        )
    # optimizer moments survive (the reference drops them on resume)
    r_leaves = jax.tree.leaves(restored.opt_state)
    s_leaves = jax.tree.leaves(state.opt_state)
    assert len(r_leaves) == len(s_leaves)
    for a, b in zip(r_leaves, s_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restored state works
    restored, metrics = step(restored, x, y)
    assert np.isfinite(float(metrics["loss"]))


def test_variables_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    model = SAM2UNet(SAM2UNetConfig(trunk=HIERA_TEST, rfb_out=8))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False
    )
    path = tmp_path / "vars"
    save_variables(str(path), dict(variables))
    loaded = restore_variables(str(path), dict(variables))
    a = jax.tree.leaves(loaded)
    b = jax.tree.leaves(dict(variables))
    for x_, y_ in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))


def test_video_reverse_tracking():
    from sam2unet_tpu.build_sam import build_sam2
    from sam2unet_tpu.models.sam2_base import SAM2Config
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    cfg = SAM2Config(image_size=64, hidden_dim=64, mem_dim=16,
                     max_obj_ptrs_in_encoder=4)
    model, variables = build_sam2("hiera_test", sam2_config=cfg,
                                  trunk_cfg=HIERA_TEST)
    pred = SAM2VideoPredictor(model, variables)
    rng = np.random.default_rng(5)
    frames = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    state = pred.init_state(images=frames)
    pred.add_new_points(state, frame_idx=3, obj_id=1,
                        points=np.array([[16.0, 16.0]]), labels=np.array([1]))
    seen = [f for f, _, _ in pred.propagate_in_video(state, reverse=True)]
    assert seen == [3, 2, 1, 0]
