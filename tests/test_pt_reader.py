"""Torch-free .pt reader: round trip against real torch.save files."""

import collections

import numpy as np
import torch

from sam2unet_tpu.interop.pt_reader import read_pt


def test_read_state_dict(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = collections.OrderedDict(
        [
            ("a.weight", torch.randn(4, 3, generator=g)),
            ("a.bias", torch.randn(4, generator=g)),
            ("conv.weight", torch.randn(8, 3, 3, 3, generator=g)),
            ("bn.running_mean", torch.zeros(8)),
            ("bn.num_batches_tracked", torch.tensor(7)),
            ("scalar", torch.tensor(2.5)),
        ]
    )
    p = tmp_path / "m.pth"
    torch.save(sd, p)
    loaded = read_pt(str(p))
    assert set(loaded) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(np.asarray(loaded[k]), v.numpy())


def test_read_nested_model_dict(tmp_path):
    sd = {"model": {"image_encoder.trunk.pos_embed": torch.ones(1, 4, 7, 7)}}
    p = tmp_path / "sam2.pt"
    torch.save(sd, p)
    loaded = read_pt(str(p))
    np.testing.assert_array_equal(
        loaded["model"]["image_encoder.trunk.pos_embed"], np.ones((1, 4, 7, 7))
    )


def test_read_bf16(tmp_path):
    t = torch.arange(8, dtype=torch.bfloat16) / 3
    p = tmp_path / "b.pt"
    torch.save({"x": t}, p)
    loaded = read_pt(str(p))
    np.testing.assert_allclose(loaded["x"], t.float().numpy(), rtol=1e-2)


def test_noncontiguous_tensor(tmp_path):
    t = torch.randn(6, 8)[:, ::2]  # strided view
    p = tmp_path / "s.pt"
    torch.save({"x": t}, p)
    loaded = read_pt(str(p))
    np.testing.assert_array_equal(loaded["x"], t.numpy())
