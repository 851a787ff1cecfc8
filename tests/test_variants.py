"""All registry trunk variants build a valid SAM2-UNet graph (shape-only,
via eval_shape — no compiles)."""

import jax
import jax.numpy as jnp
import pytest

from sam2unet_tpu.configs import SAM2UNetConfig, registry
from sam2unet_tpu.models.sam2unet import SAM2UNet


@pytest.mark.parametrize("name", ["sam2_hiera_t", "sam2_hiera_s",
                                  "sam2_hiera_b+", "sam2_hiera_l"])
def test_variant_shapes(name):
    model = SAM2UNet(SAM2UNetConfig(trunk=registry[name]))
    x = jnp.zeros((1, 352, 352, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False)
    )
    outs = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables
    )
    assert [o.shape for o in outs] == [(1, 352, 352, 1)] * 3
    # trunk channel list drives the RFB input dims automatically
    blocks0 = variables["params"]["encoder"]["blocks_0"]["block"]
    assert blocks0["attn"]["qkv"]["kernel"].shape[0] == registry[name].embed_dim
