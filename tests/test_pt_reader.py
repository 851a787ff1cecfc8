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


def test_oversized_tensor_view_rejected(tmp_path):
    """A data.pkl declaring a shape beyond its storage buffer must raise,
    not as_strided out-of-bounds process memory (restricted-reader
    contract)."""
    import io
    import pickle
    import zipfile

    import pytest

    class _StorageRef:
        pass

    class _Pickler(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _StorageRef):
                return ("storage", torch.FloatStorage, "0", "cpu", 4)
            return None

    class _Evil:
        def __reduce__(self):
            # 10**6-element view over a 4-element storage
            return (torch._utils._rebuild_tensor_v2,
                    (_StorageRef(), 0, (10**6,), (1,), False, None))

    buf = io.BytesIO()
    _Pickler(buf, protocol=2).dump({"x": _Evil()})
    bad = tmp_path / "bad.pth"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", b"\x00" * 16)  # 4 float32
    with pytest.raises(pickle.UnpicklingError, match="exceeds"):
        read_pt(str(bad))


def test_unknown_storage_type_rejected():
    """Unknown storage classes must raise instead of silently decoding the
    bytes as float32."""
    import pickle

    import pytest

    from sam2unet_tpu.interop import pt_reader

    class _FakeZf:
        def read(self, name):
            return b"\x00" * 8

    up = pt_reader._Unpickler.__new__(pt_reader._Unpickler)
    up.zf = _FakeZf()
    up.prefix = "archive"
    up._storages = {}
    fake_type = type("QInt8Storage", (), {"__name__": "QInt8Storage"})
    with pytest.raises(pickle.UnpicklingError, match="unsupported storage"):
        up.persistent_load(("storage", fake_type, "0", "cpu", 8))
