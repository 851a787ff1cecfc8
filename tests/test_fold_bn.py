"""BN folding must leave the eval forward numerically unchanged."""

import jax
import jax.numpy as jnp
import numpy as np

from sam2unet_tpu.configs import HIERA_TEST, SAM2UNetConfig
from sam2unet_tpu.models.sam2unet import SAM2UNet
from sam2unet_tpu.nn.fold_bn import fold_batchnorm


def test_fold_batchnorm_preserves_eval_forward():
    model = SAM2UNet(SAM2UNetConfig(trunk=HIERA_TEST, rfb_out=8))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    # give the running stats non-trivial values (fresh init is 0/1 which
    # would make folding vacuously easy): run one training batch
    _, mut = model.apply(
        variables, x * 3.0 + 0.5, train=True, mutable=["batch_stats"]
    )
    variables = {**variables, "batch_stats": mut["batch_stats"]}

    want = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    got = model.apply(folded, x, train=False)

    # same tree structure (drop-in for the same compiled program)
    assert jax.tree_util.tree_structure(folded) == (
        jax.tree_util.tree_structure(variables)
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-5
        )

    # the fold actually happened: BN scales are now exactly one
    rfb_bn = folded["params"]["rfb1"]["branch0_layers_0"]["bn"]["scale"]
    assert np.all(np.asarray(rfb_bn) == 1.0)
    assert not np.all(
        np.asarray(
            variables["params"]["rfb1"]["branch0_layers_0"]["bn"]["scale"]
        ) == 1.0
    ) or True  # init scale is ones; the stats perturbation is the real test
    assert np.all(
        np.asarray(folded["batch_stats"]["rfb1"]["branch0_layers_0"]["bn"]["mean"]) == 0.0
    )
