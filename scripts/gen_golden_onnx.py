#!/usr/bin/env python
"""Generate the committed golden-ONNX conformance corpus.

The in-repo numpy ONNX runtime (deploy/onnx_numpy.py) is the only engine
on this image that can execute the exported .onnx artifact (`onnx` /
`onnxruntime` / `tf2onnx` are absent), which makes it self-referential as
a verifier. This script gives it an EXTERNAL anchor: a corpus of small
op-focused ONNX graphs exported by torch.onnx with inputs and
torch-computed expected outputs, committed under tests/golden_onnx/.
tests/test_golden_onnx.py replays the corpus against the numpy runtime on
every CI run — torch is the oracle at generation time only, so the
committed artifacts pin opset conformance independent of both the runtime
and the currently-installed torch.

Run once (or when extending coverage):  python scripts/gen_golden_onnx.py
Commit the tests/golden_onnx/ outputs.
"""

from __future__ import annotations

import os
import sys
import warnings

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from sam2unet_tpu.interop import onnx_compat  # noqa: E402

# registers the in-repo protobuf bindings as `onnx` so torch.onnx.export
# can serialize on this image (no real onnx package installed)
onnx_compat.get_onnx()

OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden_onnx"
)


class Fn(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.f = f

    def forward(self, *xs):
        return self.f(*xs)


def _rng(seed):
    return np.random.default_rng(seed)


def _t(seed, *shape):
    return torch.from_numpy(
        _rng(seed).standard_normal(shape).astype(np.float32)
    )


def conv_bn_relu():
    m = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=2, dilation=2, bias=False),
        nn.BatchNorm2d(8),
        nn.ReLU(),
    )
    m[1].running_mean.normal_(0, 0.5, generator=torch.Generator().manual_seed(1))
    m[1].running_var.uniform_(0.5, 2.0, generator=torch.Generator().manual_seed(2))
    return m, (_t(10, 1, 3, 16, 16),)


def depthwise_grouped_conv():
    m = nn.Conv2d(8, 8, 3, padding=1, groups=8)
    return m, (_t(11, 1, 8, 12, 12),)


def maxpool_ceil():
    return Fn(lambda x: F.max_pool2d(x, 3, 2, 1, ceil_mode=True)), (
        _t(12, 1, 4, 15, 15),
    )


def avgpool_count_exclude():
    return Fn(lambda x: F.avg_pool2d(x, 31, 1, 15, count_include_pad=False)), (
        _t(13, 1, 2, 40, 40),
    )


def resize_bilinear_align():
    return Fn(
        lambda x: F.interpolate(
            x, scale_factor=4, mode="bilinear", align_corners=False
        )
    ), (_t(14, 1, 3, 11, 11),)


def resize_nearest():
    return Fn(lambda x: F.interpolate(x, size=(23, 17), mode="nearest")), (
        _t(15, 1, 3, 9, 9),
    )


def attention_softmax():
    def f(q, k, v):
        s = q @ k.transpose(-1, -2) / (q.shape[-1] ** 0.5)
        return F.softmax(s, dim=-1) @ v

    return Fn(f), (_t(16, 2, 4, 7, 8), _t(17, 2, 4, 7, 8), _t(18, 2, 4, 7, 8))


def gelu_erf():
    return Fn(lambda x: F.gelu(x)), (_t(19, 3, 33),)


def layernorm():
    m = nn.LayerNorm(24)
    m.weight.data = _t(20, 24)
    m.bias.data = _t(21, 24)
    return m, (_t(22, 2, 5, 24),)


def linear_gemm():
    m = nn.Linear(12, 7)
    return m, (_t(23, 4, 12),)


def pad_reflect_constant():
    def f(x):
        a = F.pad(x, (1, 2, 3, 4))
        b = F.pad(x, (2, 2, 2, 2), mode="reflect")
        return a.sum() + b.sum(), b

    return Fn(f), (_t(24, 1, 2, 9, 9),)


def slice_concat_transpose():
    def f(x):
        a = x[:, :, 1:-1:2, ::3]
        b = x.permute(0, 2, 3, 1)
        return torch.cat([a.reshape(a.shape[0], -1), b.reshape(b.shape[0], -1)], dim=1)

    return Fn(f), (_t(25, 2, 3, 10, 12),)


def reduce_and_elementwise():
    def f(x):
        m = x.mean(dim=(2, 3), keepdim=True)
        v = ((x - m) ** 2).mean(dim=(2, 3), keepdim=True)
        return (x - m) / torch.sqrt(v + 1e-5) * torch.sigmoid(x)

    return Fn(f), (_t(26, 2, 3, 8, 8),)


def expand_gather_where():
    def f(x, idx):
        g = torch.index_select(x, 1, idx)
        w = torch.where(g > 0, g, g * 0.1)
        return w + torch.ones(1, 1, 5).expand(2, 3, 5)

    return Fn(f), (
        _t(27, 2, 6, 5),
        torch.tensor([0, 3, 5], dtype=torch.long),
    )


def upsample_convtranspose():
    m = nn.ConvTranspose2d(4, 2, 2, stride=2)
    return m, (_t(28, 1, 4, 7, 7),)


CASES = {
    "conv_bn_relu": conv_bn_relu,
    "depthwise_grouped_conv": depthwise_grouped_conv,
    "maxpool_ceil": maxpool_ceil,
    "avgpool_count_exclude": avgpool_count_exclude,
    "resize_bilinear_align": resize_bilinear_align,
    "resize_nearest": resize_nearest,
    "attention_softmax": attention_softmax,
    "gelu_erf": gelu_erf,
    "layernorm": layernorm,
    "linear_gemm": linear_gemm,
    "pad_reflect_constant": pad_reflect_constant,
    "slice_concat_transpose": slice_concat_transpose,
    "reduce_and_elementwise": reduce_and_elementwise,
    "expand_gather_where": expand_gather_where,
    "upsample_convtranspose": upsample_convtranspose,
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    torch.manual_seed(0)
    for name, make in CASES.items():
        mod, xs = make()
        mod.eval()
        with torch.no_grad():
            want = mod(*xs)
        if isinstance(want, torch.Tensor):
            want = (want,)
        path = os.path.join(OUT_DIR, f"{name}.onnx")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with torch.no_grad():
                torch.onnx.export(
                    mod, xs, path, opset_version=17, dynamo=False,
                    input_names=[f"in{i}" for i in range(len(xs))],
                    output_names=[f"out{i}" for i in range(len(want))],
                )
        arrays = {f"in{i}": x.numpy() for i, x in enumerate(xs)}
        arrays |= {f"out{i}": o.numpy() for i, o in enumerate(want)}
        np.savez(os.path.join(OUT_DIR, f"{name}.npz"), **arrays)
        print(f"{name}: {os.path.getsize(path)} bytes, "
              f"{len(xs)} inputs, {len(want)} outputs")


if __name__ == "__main__":
    main()
