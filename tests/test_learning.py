"""End-to-end learning check: the full train step (fused kernels, PEFT
partition, BN updates) must actually fit a tiny synthetic task."""

import jax
import jax.numpy as jnp
import numpy as np

from sam2unet_tpu.configs import HIERA_TEST, SAM2UNetConfig
from sam2unet_tpu.models.sam2unet import SAM2UNet
from sam2unet_tpu.train.engine import create_train_state, make_train_step
from sam2unet_tpu.train.optim import make_optimizer


def _synthetic_batch(rng, n=8, size=64):
    """Bright rectangle on dark noise; mask = the rectangle."""
    images = rng.normal(0.0, 0.2, (n, size, size, 3)).astype(np.float32)
    labels = np.zeros((n, size, size, 1), np.float32)
    for i in range(n):
        y0, x0 = rng.integers(4, size // 2, 2)
        h, w = rng.integers(size // 4, size // 2, 2)
        images[i, y0 : y0 + h, x0 : x0 + w] += 1.5
        labels[i, y0 : y0 + h, x0 : x0 + w] = 1.0
    return jnp.asarray(images), jnp.asarray(labels)


def test_train_step_learns_synthetic_task():
    model = SAM2UNet(SAM2UNetConfig(trunk=HIERA_TEST, rfb_out=8))
    rng = np.random.default_rng(0)
    images, labels = _synthetic_batch(rng)

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images, train=False
    )
    opt = make_optimizer(lr=5e-3, epochs=1000, steps_per_epoch=1)
    state = create_train_state(variables, opt)
    step = make_train_step(model, opt, donate=False)

    losses = []
    for _ in range(80):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    # prediction should overlap the rectangle reasonably after overfitting
    out, _, _ = model.apply(state.variables(), images, train=False)
    pred = np.asarray(out[..., 0]) > 0
    gt = np.asarray(labels[..., 0]) > 0.5
    inter = (pred & gt).sum()
    union = (pred | gt).sum()
    assert inter / union > 0.3, inter / union
