"""End-to-end checkpoint loading: official SAM2 .pt -> SAM2UNet trunk init
(the train.py --hiera_path contract), via the torch-free reader."""

import numpy as np
import torch

from tests.ref_loader import load_ref_hiera_module, state_dict_numpy

from sam2unet_tpu.cli.common import build_model, init_variables, load_weights


def test_hiera_path_loading(tmp_path):
    hieradet = load_ref_hiera_module()
    trunk = hieradet.Hiera(
        embed_dim=96, num_heads=1, stages=[1, 2, 11, 2],
        global_att_blocks=[7, 10, 13], window_pos_embed_bkg_spatial_size=[7, 7],
    )
    g = torch.Generator().manual_seed(1)
    sd = trunk.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.02
    trunk.load_state_dict(sd)

    # package as an official-style checkpoint: {"model": {"image_encoder.trunk.*"}}
    full = {
        "model": {f"image_encoder.trunk.{k}": v for k, v in sd.items()}
    }
    ckpt = tmp_path / "sam2_hiera_small.pt"
    torch.save(full, ckpt)

    model, _ = build_model("sam2_hiera_s")
    variables = init_variables(model, size=64)
    before = np.asarray(
        variables["params"]["encoder"]["blocks_0"]["block"]["attn"]["qkv"]["kernel"]
    ).copy()
    adapters_before = np.asarray(
        variables["params"]["encoder"]["blocks_0"]["prompt_learn"]["layers_0"]["kernel"]
    ).copy()

    loaded = load_weights(variables, hiera_path=str(ckpt))

    got = np.asarray(
        loaded["params"]["encoder"]["blocks_0"]["block"]["attn"]["qkv"]["kernel"]
    )
    want = sd["blocks.0.attn.qkv.weight"].numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    assert not np.allclose(got, before)
    # adapters are untouched (not present in the official checkpoint)
    np.testing.assert_array_equal(
        np.asarray(
            loaded["params"]["encoder"]["blocks_0"]["prompt_learn"]["layers_0"]["kernel"]
        ),
        adapters_before,
    )
    # decoder/neck untouched too
    assert "rfb1" in loaded["params"]


def test_strict_loading_rejects_bad_checkpoint(tmp_path):
    import pytest

    full = {"model": {"image_encoder.trunk.pos_embed": torch.zeros(1, 96, 7, 7)}}
    ckpt = tmp_path / "bad.pt"
    torch.save(full, ckpt)
    model, _ = build_model("sam2_hiera_s")
    variables = init_variables(model, size=64)
    with pytest.raises(RuntimeError, match="strict load failed"):
        load_weights(variables, hiera_path=str(ckpt))
