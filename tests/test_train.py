"""Train engine tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from sam2unet_tpu.configs import HieraConfig, SAM2UNetConfig
from sam2unet_tpu.models.sam2unet import SAM2UNet
from sam2unet_tpu.parallel.mesh import make_mesh
from sam2unet_tpu.train.engine import create_train_state, make_eval_step, make_train_step
from sam2unet_tpu.train.loss import structure_loss
from sam2unet_tpu.train.optim import is_trainable, make_optimizer, partition_params

TINY = SAM2UNetConfig(
    trunk=HieraConfig(
        embed_dim=8,
        stages=(1, 1, 1, 1),
        global_att_blocks=(2,),
        window_spec=(4, 2, 2, 2),
        window_pos_embed_bkg_spatial_size=(7, 7),
    ),
    rfb_out=8,
)


def _torch_structure_loss(pred, mask):
    """Oracle for the reference's actual loss semantics (train.py:21-29):
    scalar mean BCE (the legacy reduce kwarg collapses the weighting) plus
    the per-image weighted IoU."""
    weit = 1 + 5 * torch.abs(
        TF.avg_pool2d(mask, kernel_size=31, stride=1, padding=15) - mask
    )
    bce_scalar = TF.binary_cross_entropy_with_logits(pred, mask, reduction="mean")
    wbce = (weit * bce_scalar).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    p = torch.sigmoid(pred)
    inter = (p * mask * weit).sum(dim=(2, 3))
    union = ((p + mask) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    return (wbce + wiou).mean()


def test_structure_loss_matches_reference_semantics():
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 1, 40, 40)).astype(np.float32)
    mask = (rng.random((2, 1, 40, 40)) > 0.6).astype(np.float32)
    ref = _torch_structure_loss(torch.from_numpy(pred), torch.from_numpy(mask)).item()
    got = float(
        structure_loss(
            jnp.transpose(jnp.asarray(pred), (0, 2, 3, 1)),
            jnp.transpose(jnp.asarray(mask), (0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_peft_mask_freezes_trunk_only():
    assert is_trainable(("rfb1", "conv_cat", "conv", "kernel"))
    assert is_trainable(("head", "bias"))
    assert is_trainable(("encoder", "blocks_3", "prompt_learn", "layers_0", "kernel"))
    assert not is_trainable(("encoder", "blocks_3", "block", "attn", "qkv", "kernel"))
    # up4 is constructed-but-unused in the reference: its torch grads stay
    # None so AdamW never touches it (not even weight decay)
    assert not is_trainable(("up4", "conv", "layers_0", "kernel"))
    assert not is_trainable(("encoder", "pos_embed"))
    assert not is_trainable(("encoder", "patch_embed_proj", "kernel"))


@pytest.fixture(scope="module")
def tiny_setup():
    model = SAM2UNet(TINY)
    x = jnp.zeros((8, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    return model, variables


def test_train_step_updates_only_trainable(tiny_setup):
    model, variables = tiny_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    opt = make_optimizer(lr=1e-3, epochs=10, steps_per_epoch=2)
    state = create_train_state(variables, opt)
    step = make_train_step(model, opt, mesh=mesh, donate=False)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.standard_normal((8, 64, 64, 3)), jnp.float32)
    labels = jnp.asarray((rng.random((8, 64, 64, 1)) > 0.5), jnp.float32)

    state1, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))

    # frozen leaves bit-identical, trainable leaves moved
    for k, v in state1.frozen.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(state.frozen[k]))
    moved = [
        k
        for k, v in state1.trainable.items()
        if not np.allclose(np.asarray(v), np.asarray(state.trainable[k]))
    ]
    assert len(moved) > len(state1.trainable) // 2

    # loss decreases over a few steps on a fixed batch
    losses = [float(metrics["loss"])]
    s = state1
    for _ in range(3):
        s, m = step(s, images, labels)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_dp_step_matches_single_device(tiny_setup):
    """The mesh-sharded train step is numerically the single-device step:
    GSPMD partitions one program, so loss, params and BN stats must agree
    to float tolerance after two steps. SGD (not Adam) keeps the update
    linear in the gradient — Adam's normalization would amplify the psum
    reorder noise on near-zero BN-bias gradients into sign flips."""
    import optax

    from sam2unet_tpu.parallel.mesh import shard_batch

    model, variables = tiny_setup
    opt = optax.sgd(1e-2)
    mesh = make_mesh()
    step_one = make_train_step(model, opt, donate=False)
    step_dp = make_train_step(model, opt, mesh=mesh, donate=False)

    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.standard_normal((8, 64, 64, 3)), jnp.float32)
    labels = jnp.asarray((rng.random((8, 64, 64, 1)) > 0.5), jnp.float32)

    sa = create_train_state(variables, opt)
    sb = create_train_state(variables, opt)
    for _ in range(2):
        sa, ma = step_one(sa, images, labels)
        sb, mb = step_dp(sb, shard_batch(mesh, images), shard_batch(mesh, labels))
    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=1e-5, atol=1e-6
    )
    for k in sa.trainable:
        np.testing.assert_allclose(
            np.asarray(sa.trainable[k]), np.asarray(sb.trainable[k]),
            rtol=1e-4, atol=1e-5, err_msg=str(k),
        )
    if sa.batch_stats is not None:
        flat_a = jax.tree_util.tree_leaves(sa.batch_stats)
        flat_b = jax.tree_util.tree_leaves(sb.batch_stats)
        for va, vb in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), rtol=1e-4, atol=1e-5
            )


def test_eval_step_sharded(tiny_setup):
    model, variables = tiny_setup
    mesh = make_mesh()
    ev = make_eval_step(model, mesh=mesh)
    out, out1, out2 = ev(variables, jnp.zeros((8, 64, 64, 3)))
    assert out.shape == (8, 64, 64, 1)
    # output really is sharded over the data axis
    assert len(out.sharding.device_set) == 8


def test_partition_roundtrip(tiny_setup):
    _, variables = tiny_setup
    from sam2unet_tpu.train.optim import merge_params

    t, f = partition_params(variables["params"])
    merged = merge_params(t, f)
    flat_a = jax.tree_util.tree_leaves(merged)
    flat_b = jax.tree_util.tree_leaves(variables["params"])
    assert len(flat_a) == len(flat_b)
