"""Executed ONNX coverage: artifact production + numpy runtime parity.

The reference exports SAM2-UNet to ONNX and parity-checks it under
onnxruntime (convert_onnx.py:20-107, test_onnx.py). Neither `onnx` nor
`onnxruntime` exist on this image, so the framework carries its own ONNX
protobuf bindings (interop/onnx_compat, protoc-compiled) and a numpy ONNX
runtime (deploy/onnx_numpy). These tests actually produce a .onnx file —
framework weights -> torch bridge -> torch.onnx.export — and verify it
numerically against both oracles (torch forward, framework forward), then
serve it through deploy.segmenter's onnx backend.
"""

import io
import warnings

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.ref_loader import load_ref_sam2unet_class, state_dict_numpy

from sam2unet_tpu.configs import HIERA_S, SAM2UNetConfig
from sam2unet_tpu.deploy.onnx_numpy import NumpyOnnxRunner
from sam2unet_tpu.interop import onnx_compat
from sam2unet_tpu.interop.export import export_onnx_via_torch, verify_onnx
from sam2unet_tpu.interop.torch_convert import (
    convert_state_dict,
    flax_to_torch_state_dict,
)
from sam2unet_tpu.models.sam2unet import SAM2UNet

SIZE = 128


def _export_bytes(mod, *xs, opset=16):
    mod.eval()
    buf = io.BytesIO()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with torch.no_grad():
            torch.onnx.export(mod, xs, buf, opset_version=opset, dynamo=False)
    return buf.getvalue()


def test_onnx_shim_parses_torch_export():
    onnx = onnx_compat.get_onnx()
    assert hasattr(onnx, "load_model_from_string")
    mod = nn.Conv2d(3, 4, 3, padding=1)
    model = onnx_compat.load_model_from_string(_export_bytes(mod, torch.zeros(1, 3, 8, 8)))
    assert model.graph.node[0].op_type == "Conv"
    weights = {t.name: onnx_compat.tensor_to_array(t) for t in model.graph.initializer}
    w = [v for v in weights.values() if v.ndim == 4][0]
    np.testing.assert_array_equal(w, mod.weight.detach().numpy())


class _Fn(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.f = f

    def forward(self, *xs):
        return self.f(*xs)


_g = torch.Generator().manual_seed(0)


def _t(*shape):
    return torch.randn(*shape, generator=_g)


@pytest.mark.parametrize(
    "name,mod,xs",
    [
        ("conv_group_dilated",
         nn.Conv2d(8, 12, 3, stride=2, padding=2, dilation=2, groups=4),
         (_t(2, 8, 19, 23),)),
        ("maxpool_ceil", nn.MaxPool2d(3, 2, ceil_mode=True), (_t(2, 4, 17, 19),)),
        ("maxpool_dilated", nn.MaxPool2d(3, stride=2, dilation=2),
         (_t(2, 4, 17, 19),)),
        ("conv_bn", nn.Sequential(nn.Conv2d(3, 4, 1), nn.BatchNorm2d(4)),
         (_t(2, 3, 8, 8),)),
        ("linear_gemm", nn.Linear(16, 8), (_t(5, 16),)),
        ("ln_softmax", nn.Sequential(nn.LayerNorm(16), nn.Softmax(dim=-1)),
         (_t(3, 7, 16),)),
        ("gelu_erf", nn.GELU(), (_t(3, 33),)),
        ("resize_bilinear",
         _Fn(lambda x: F.interpolate(x, scale_factor=2, mode="bilinear")),
         (_t(1, 3, 11, 13),)),
        ("resize_align_corners",
         _Fn(lambda x: F.interpolate(x, size=(20, 24), mode="bilinear",
                                     align_corners=True)),
         (_t(1, 3, 11, 13),)),
        ("resize_bicubic",
         _Fn(lambda x: F.interpolate(x, size=(17, 9), mode="bicubic")),
         (_t(1, 3, 11, 13),)),
        ("pad_and_crop", _Fn(lambda x: F.pad(x, (2, -1, -2, 3))),
         (_t(1, 3, 9, 9),)),
        ("strided_slice", _Fn(lambda x: x[:, ::2, 1:-1]), (_t(4, 9, 9),)),
        ("chunk_cat",
         _Fn(lambda x: torch.cat(torch.chunk(x, 3, dim=1), dim=2)),
         (_t(2, 9, 5),)),
        ("attention_shapes",
         _Fn(lambda q, k: torch.softmax(q @ k.transpose(-1, -2) / 4.0, -1) @ k),
         (_t(2, 4, 7, 8), _t(2, 4, 7, 8))),
        ("where_expand",
         _Fn(lambda x: torch.where(x > 0, x, torch.zeros_like(x)).expand(2, -1, -1)),
         (_t(1, 4, 5),)),
        ("reductions", _Fn(lambda x: (x.mean(-1, keepdim=True), x.sum(1))),
         (_t(3, 4, 5),)),
    ],
)
def test_numpy_runtime_per_op(name, mod, xs):
    data = _export_bytes(mod, *xs)
    with torch.no_grad():
        want = mod(*xs)
    if not isinstance(want, (tuple, list)):
        want = [want]
    runner = NumpyOnnxRunner(data)
    got = runner(*[x.numpy() for x in xs])
    for out_name, ref in zip(runner.output_names, want):
        np.testing.assert_allclose(
            np.asarray(got[out_name], np.float32), ref.numpy(), atol=5e-5,
            rtol=1e-4, err_msg=name,
        )


def _pb2():
    return onnx_compat._ensure_pb2()


def _mk_graph(pb2, nodes, in_names, out_names, name="g"):
    g = pb2.GraphProto(name=name)
    g.node.extend(nodes)
    for n in in_names:
        vi = pb2.ValueInfoProto(name=n)
        vi.type.tensor_type.elem_type = 1
        g.input.append(vi)
    for n in out_names:
        vi = pb2.ValueInfoProto(name=n)
        vi.type.tensor_type.elem_type = 1
        g.output.append(vi)
    return g


def _mk_model(pb2, graph, opset=16):
    m = pb2.ModelProto(ir_version=8)
    m.graph.CopyFrom(graph)
    op = m.opset_import.add()
    op.version = opset
    return m


def test_tensorproto_fp16_typed_storage_bitcast():
    """fp16 tensors without raw_data store uint16 BIT PATTERNS in
    int32_data (ONNX spec); decoding must bit-cast, not value-cast."""
    pb2 = _pb2()
    t = pb2.TensorProto(data_type=10, dims=[2])
    t.int32_data.extend([15360, 49152])  # fp16 bits of 1.0 and -2.0
    got = onnx_compat.tensor_to_array(t)
    np.testing.assert_array_equal(got.astype(np.float32),
                                  np.array([1.0, -2.0], np.float32))


def test_resize_nearest_round_prefer_floor_default():
    """Default nearest_mode is round_prefer_floor: 4 -> 8 half_pixel must
    duplicate every source index, not floor-shift every other one."""
    from sam2unet_tpu.deploy.onnx_numpy import _interp_taps

    idx, w = _interp_taps(8, 4, 2.0, "nearest", "half_pixel", -0.75)
    np.testing.assert_array_equal(idx[:, 0], [0, 0, 1, 1, 2, 2, 3, 3])
    idx_f, _ = _interp_taps(8, 4, 2.0, "nearest", "half_pixel", -0.75,
                            nearest_mode="floor")
    np.testing.assert_array_equal(idx_f[:, 0], [0, 0, 0, 1, 1, 2, 2, 3])


def test_split_equal_without_sizes_opset16():
    """Opset 13-17 equal Split has no `split` input and no num_outputs
    attribute — the count comes from the node's output list."""
    pb2 = _pb2()
    node = pb2.NodeProto(op_type="Split", name="s")
    node.input.append("x")
    node.output.extend(["a", "b"])
    a_ax = node.attribute.add()
    a_ax.name, a_ax.type, a_ax.i = "axis", 2, 1
    model = _mk_model(pb2, _mk_graph(pb2, [node], ["x"], ["a", "b"]))
    x = np.arange(12, dtype=np.float32).reshape(2, 6)
    out = NumpyOnnxRunner(model)(x)
    np.testing.assert_array_equal(out["a"], x[:, :3])
    np.testing.assert_array_equal(out["b"], x[:, 3:])


def test_if_branch_does_not_clobber_outer_names():
    """ONNX subgraphs have their own namespace: an If-branch intermediate
    legally named like an outer tensor must not overwrite it."""
    pb2 = _pb2()
    # then-branch: t = Constant(100.0); ybr = Identity(t)  (clobbers 't')
    cst = pb2.NodeProto(op_type="Constant", name="c")
    cst.output.append("t")
    at = cst.attribute.add()
    at.name, at.type = "value", 4
    at.t.data_type = 1
    at.t.float_data.append(100.0)
    ident = pb2.NodeProto(op_type="Identity", name="i")
    ident.input.append("t")
    ident.output.append("ybr")
    branch = _mk_graph(pb2, [cst, ident], [], ["ybr"], name="then")

    iff = pb2.NodeProto(op_type="If", name="if")
    iff.input.append("cond")
    iff.output.append("y")
    for aname in ("then_branch", "else_branch"):
        ab = iff.attribute.add()
        ab.name, ab.type = aname, 5
        ab.g.CopyFrom(branch)
    add = pb2.NodeProto(op_type="Add", name="a")
    add.input.extend(["t", "y"])     # outer 't' must still be the input
    add.output.append("o")
    model = _mk_model(pb2, _mk_graph(pb2, [iff, add],
                                     ["cond", "t"], ["o"]))
    out = NumpyOnnxRunner(model)(np.asarray(True), np.float32(1.5))
    assert float(out["o"]) == 101.5  # 1.5 (outer t) + 100 (branch value)


def test_if_branch_initializers_are_seeded():
    """If branches may carry their own initializers (exporters and graph
    optimizers move constants there); they must load into the branch
    scope instead of raising KeyError."""
    pb2 = _pb2()
    ident = pb2.NodeProto(op_type="Identity", name="i")
    ident.input.append("bc")
    ident.output.append("ybr")
    branch = _mk_graph(pb2, [ident], [], ["ybr"], name="then")
    t = branch.initializer.add()
    t.name, t.data_type = "bc", 1
    t.dims.extend([2])
    t.float_data.extend([3.0, 4.0])
    iff = pb2.NodeProto(op_type="If", name="if")
    iff.input.append("cond")
    iff.output.append("y")
    for aname in ("then_branch", "else_branch"):
        ab = iff.attribute.add()
        ab.name, ab.type = aname, 5
        ab.g.CopyFrom(branch)
    model = _mk_model(pb2, _mk_graph(pb2, [iff], ["cond"], ["y"]))
    out = NumpyOnnxRunner(model)(np.asarray(True))
    np.testing.assert_array_equal(
        np.asarray(out["y"], np.float32), np.array([3.0, 4.0], np.float32)
    )


def _conv_model(pb2, add_attrs):
    n = pb2.NodeProto(op_type="Conv", name="cv")
    n.input.extend(["x", "w"])
    n.output.append("y")
    ks = n.attribute.add()
    ks.name, ks.type = "kernel_shape", 7
    ks.ints.extend([3, 3])
    st = n.attribute.add()
    st.name, st.type = "strides", 7
    st.ints.extend([2, 2])
    add_attrs(n)
    return _mk_model(pb2, _mk_graph(pb2, [n], ["x", "w"], ["y"]))


def test_conv_auto_pad_same_matches_explicit_pads():
    """auto_pad SAME_UPPER/SAME_LOWER must actually pad (in=14, k=3, s=2
    -> out=7 needs 1 total pad per axis: UPPER at the end, LOWER at the
    start) — not silently run with pads=[0,0,0,0]."""
    pb2 = _pb2()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 14, 14)).astype(np.float32)
    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32)

    def explicit(pads):
        def f(n):
            p = n.attribute.add()
            p.name, p.type = "pads", 7
            p.ints.extend(pads)
        return f

    def auto(mode):
        def f(n):
            ap = n.attribute.add()
            ap.name, ap.type = "auto_pad", 3
            ap.s = mode.encode()
        return f

    def run(m):
        return NumpyOnnxRunner(m)(x, w)["y"]

    up = run(_conv_model(pb2, auto("SAME_UPPER")))
    lo = run(_conv_model(pb2, auto("SAME_LOWER")))
    assert up.shape == (1, 4, 7, 7)
    np.testing.assert_allclose(
        up, run(_conv_model(pb2, explicit([0, 0, 1, 1]))), rtol=1e-5
    )
    np.testing.assert_allclose(
        lo, run(_conv_model(pb2, explicit([1, 1, 0, 0]))), rtol=1e-5
    )
    assert not np.allclose(up, lo)


def test_cast_to_bfloat16_rounds():
    """Cast(to=16): numpy has no bf16, so values round to bf16 precision
    (nearest-even) and come back as float32."""
    pb2 = _pb2()
    node = pb2.NodeProto(op_type="Cast", name="c")
    node.input.append("x")
    node.output.append("y")
    a = node.attribute.add()
    a.name, a.type, a.i = "to", 2, 16
    model = _mk_model(pb2, _mk_graph(pb2, [node], ["x"], ["y"]))
    x = np.array([1.0, 1.0 + 2**-7, 1.0 + 2**-8], np.float32)
    out = NumpyOnnxRunner(model)(x)["y"]
    # 1+2^-7 is exactly representable in bf16; 1+2^-8 ties -> even (1.0)
    np.testing.assert_array_equal(out, np.array(
        [1.0, 1.0 + 2**-7, 1.0], np.float32))


@pytest.fixture(scope="module")
def onnx_setup(tmp_path_factory):
    """Shared-weight trio: torch reference, framework variables, and a
    .onnx artifact exported from the framework weights."""
    cls = load_ref_sam2unet_class()
    ref = cls(checkpoint_path="")
    g = torch.Generator().manual_seed(7)
    sd = ref.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g, dtype=v.dtype) * 0.05
    ref.load_state_dict(sd)
    ref.eval()
    variables = convert_state_dict(state_dict_numpy(ref))
    model = SAM2UNet(SAM2UNetConfig(trunk=HIERA_S))
    path = str(tmp_path_factory.mktemp("onnx") / "sam2unet.onnx")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        export_onnx_via_torch(ref, variables, SIZE, path)
    return ref, model, variables, path


def test_flax_to_torch_roundtrip(onnx_setup):
    ref, _, variables, _ = onnx_setup
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    back = flax_to_torch_state_dict(variables, list(sd.keys()))
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_onnx_artifact_matches_torch(onnx_setup):
    ref, _, _, path = onnx_setup
    import os

    assert os.path.getsize(path) > 10e6  # real weights inside
    x = torch.from_numpy(
        np.random.default_rng(3).standard_normal((1, 3, SIZE, SIZE)).astype(np.float32)
    )
    with torch.no_grad():
        want = ref(x)
    runner = NumpyOnnxRunner(path)
    got = runner(x.numpy())
    assert runner.output_names == ["output", "output_1", "output_2"]
    for name, ref_out in zip(runner.output_names, want):
        np.testing.assert_allclose(
            got[name], ref_out.numpy(), atol=1e-5, rtol=1e-4, err_msg=name
        )


def test_onnx_artifact_matches_framework(onnx_setup):
    _, model, variables, path = onnx_setup
    max_diff = verify_onnx(model, variables, SIZE, path)
    assert max_diff < 5e-4


def test_onnx_artifact_matches_tf_savedmodel(onnx_setup, tmp_path):
    """Cross-verify the .onnx through two INDEPENDENT execution paths of
    the same weights: torch-bridge .onnx under the in-repo numpy runtime
    vs jax2tf SavedModel under the TensorFlow runtime (a third-party
    engine actually executing). Exporter and verifier no longer share a
    single code path — the closest this image gets to the reference's
    onnxruntime check (convert_onnx.py:69-107)."""
    tf = pytest.importorskip("tensorflow")
    from sam2unet_tpu.interop.export import export_tf_savedmodel

    _, model, variables, onnx_path = onnx_setup
    sm = str(tmp_path / "sm")
    export_tf_savedmodel(model, variables, SIZE, sm)
    loaded = tf.saved_model.load(sm)

    x_nhwc = np.random.default_rng(9).standard_normal(
        (1, SIZE, SIZE, 3)
    ).astype(np.float32)
    tf_out = loaded.f(tf.constant(x_nhwc))
    runner = NumpyOnnxRunner(onnx_path)
    onnx_out = runner(x_nhwc.transpose(0, 3, 1, 2))
    assert set(tf_out.keys()) == set(runner.output_names)
    for name in runner.output_names:
        got = onnx_out[name].transpose(0, 2, 3, 1)  # NCHW -> NHWC
        want = np.asarray(tf_out[name])
        np.testing.assert_allclose(
            got, want, rtol=1e-3, atol=1e-3, err_msg=name
        )


def test_segmenter_onnx_backend(onnx_setup):
    from sam2unet_tpu.deploy.segmenter import SamUnetSegmenter

    _, _, _, path = onnx_setup
    seg = SamUnetSegmenter(path, input_size=SIZE, backend="onnx")
    img = (np.random.default_rng(5).random((97, 143, 3)) * 255).astype(np.uint8)
    mask = seg.segment(img)
    assert mask.shape == (97, 143) and mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    assert seg.last_process_time > 0  # ran the model, not the failure path


def _cli_torch_factory():
    """Zero-arg factory for convert_onnx --torch_impl (weights are
    overwritten by the CLI from the framework checkpoint)."""
    return load_ref_sam2unet_class()(checkpoint_path="")


def test_convert_onnx_cli_torch_bridge(onnx_setup, tmp_path, monkeypatch, capsys):
    """Root convert_onnx.py --format onnx end to end on this image: framework
    .pth checkpoint -> torch-bridge export -> numpy-runtime parity verify
    (the reference CLI contract, convert_onnx.py:20-107)."""
    ref, _, _, _ = onnx_setup
    ckpt = str(tmp_path / "SAM2-UNet-test.pth")
    torch.save(ref.state_dict(), ckpt)
    out = str(tmp_path / "cli.onnx")
    import convert_onnx as cli

    monkeypatch.setattr(
        "sys.argv",
        ["convert_onnx.py", "--checkpoint", ckpt, "--output", out,
         "--size", str(SIZE), "--model_cfg", "sam2_hiera_s",
         "--format", "onnx",
         "--torch_impl", "tests.test_onnx_artifact:_cli_torch_factory"],
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cli.main()
    captured = capsys.readouterr().out
    assert "Export verified" in captured
    import os

    assert os.path.getsize(out) > 10e6
