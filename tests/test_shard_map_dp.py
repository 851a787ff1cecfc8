"""shard_map data parallelism == GSPMD data parallelism, numerically.

The shard_map form runs each device's full per-shard program locally with
explicit pmean'd grads and SyncBN (bn_axis) — the execution style required
on real multi-chip TPU, where Mosaic/Pallas custom calls cannot be
partitioned by GSPMD. On the 8-virtual-device CPU mesh both forms lower to
the same math, so one train step must match to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sam2unet_tpu.configs import HIERA_TEST, SAM2UNetConfig
from sam2unet_tpu.models.sam2unet import SAM2UNet
from sam2unet_tpu.parallel.mesh import DATA_AXIS, make_mesh
from sam2unet_tpu.train.engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

BATCH, SIZE = 8, 64


@pytest.fixture(scope="module")
def setup():
    cfg = SAM2UNetConfig(trunk=HIERA_TEST)
    model = SAM2UNet(cfg=cfg, include_unused_up4=False)
    model_sync = SAM2UNet(cfg=cfg, include_unused_up4=False,
                          bn_axis=DATA_AXIS)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(BATCH, SIZE, SIZE, 3)), jnp.float32)
    labels = jnp.asarray(
        (rng.random((BATCH, SIZE, SIZE, 1)) > 0.5), jnp.float32
    )
    return model, model_sync, variables, images, labels


def test_shard_map_train_step_matches_gspmd(setup):
    model, model_sync, variables, images, labels = setup
    mesh = make_mesh()
    # SGD, not Adam: Adam's first step is ~sign(grad)*lr, so fp-level grad
    # noise near zero flips whole-lr update signs and defeats the tolerance
    opt = optax.sgd(1e-2)

    step_gspmd = make_train_step(model, opt, mesh=mesh, donate=False)
    step_smap = make_train_step(model_sync, opt, mesh=mesh, donate=False,
                                use_shard_map=True)

    s0 = create_train_state(dict(variables), opt)
    s1, m1 = step_gspmd(s0, images, labels)
    s2, m2 = step_smap(create_train_state(dict(variables), opt),
                       images, labels)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    flat1 = jax.tree.leaves(s1.trainable)
    flat2 = jax.tree.leaves(s2.trainable)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    # SyncBN: running stats also match the GSPMD global-batch reduction
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_shard_map_eval_step_matches_gspmd(setup):
    model, _, variables, images, _ = setup
    mesh = make_mesh()
    ev_gspmd = make_eval_step(model, mesh=mesh)
    ev_smap = make_eval_step(model, mesh=mesh, use_shard_map=True)
    o1 = ev_gspmd(variables, images)
    o2 = ev_smap(variables, images)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # outputs really are laid out across all 8 devices
    assert len(o2[0].sharding.device_set) == 8
