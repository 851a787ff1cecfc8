"""Golden numerical parity: our flax models vs the reference torch modules.

The reference implementation is imported in-place (see ref_loader.py) and
used as an oracle: random-initialized torch weights are converted with
interop/torch_convert and the two forward passes must agree to fp32
tolerance. This is the framework's core correctness gate (SURVEY.md §4)."""

import numpy as np
import pytest
import torch

from tests.ref_loader import (
    load_ref_hiera_module,
    load_ref_sam2unet_class,
    state_dict_numpy,
)

from sam2unet_tpu.configs import HIERA_S, SAM2UNetConfig
from sam2unet_tpu.interop.torch_convert import convert_state_dict, validate_against
from sam2unet_tpu.models.hiera import Hiera
from sam2unet_tpu.models.sam2unet import SAM2UNet

SIZE = 128  # small but covers windows, q-pool, global blocks (grid 32->4)


def _rand_init(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g, dtype=v.dtype) * 0.05
    module.load_state_dict(sd)
    return module


@pytest.fixture(scope="module")
def torch_hiera():
    hieradet = load_ref_hiera_module()
    m = hieradet.Hiera(
        embed_dim=96, num_heads=1, stages=[1, 2, 11, 2],
        global_att_blocks=[7, 10, 13], window_pos_embed_bkg_spatial_size=[7, 7],
    )
    return _rand_init(m).eval()


def test_hiera_trunk_parity(torch_hiera):
    import jax

    x = np.random.default_rng(0).standard_normal((1, 3, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in torch_hiera(torch.from_numpy(x))]

    variables = convert_state_dict(state_dict_numpy(torch_hiera))
    model = Hiera(HIERA_S, use_adapters=False)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.transpose(x, (0, 2, 3, 1)),
                           train=False)
    )
    validate_against(dict(template), variables, scope="hiera trunk")

    outs = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, np.transpose(x, (0, 2, 3, 1))
    )
    assert len(outs) == len(ref_outs) == 4
    for got, ref in zip(outs, ref_outs):
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def torch_sam2unet():
    cls = load_ref_sam2unet_class()
    return _rand_init(cls(checkpoint_path="")).eval()


def test_sam2unet_full_parity(torch_sam2unet):
    import jax

    x = np.random.default_rng(1).standard_normal((1, 3, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_out1, ref_out2 = [
            o.numpy() for o in torch_sam2unet(torch.from_numpy(x))
        ]

    variables = convert_state_dict(state_dict_numpy(torch_sam2unet))
    model = SAM2UNet(SAM2UNetConfig(trunk=HIERA_S))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.transpose(x, (0, 2, 3, 1)),
                           train=False)
    )
    validate_against(dict(template), variables, scope="sam2unet")

    out, out1, out2 = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, np.transpose(x, (0, 2, 3, 1))
    )
    for got, ref in [(out, ref_out), (out1, ref_out1), (out2, ref_out2)]:
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
