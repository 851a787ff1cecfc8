"""Self-contained ONNX protobuf support.

The reference ships an ONNX export + runtime-parity harness
(convert_onnx.py:20-107, test_onnx.py). The `onnx` pip package is not part
of this image, so this package compiles a wire-compatible schema subset
(`onnx.proto`, field numbers per the public ONNX IR spec) with the system
`protoc` and exposes:

- ``get_onnx()``: the real ``onnx`` module when installed, otherwise a shim
  module built on the locally generated bindings. The shim is registered in
  ``sys.modules['onnx']`` so third-party exporters (``torch.onnx.export``'s
  TorchScript path needs ``onnx.load_model_from_string`` for its onnxscript
  post-pass) work unmodified.
- ``load_model`` / ``load_model_from_string``: parse a ``.onnx`` file.
- ``tensor_to_array``: TensorProto -> numpy (raw or typed payloads).
"""

from __future__ import annotations

import importlib.util
import subprocess
import sys
import types
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_GEN = _HERE / "_gen"
_pb2 = None


def _ensure_pb2():
    """Compile onnx.proto with protoc once and import the bindings."""
    global _pb2
    if _pb2 is not None:
        return _pb2
    gen_file = _GEN / "onnx_pb2.py"
    if not gen_file.exists():
        _GEN.mkdir(exist_ok=True)
        try:
            subprocess.run(
                ["protoc", f"--python_out={_GEN}", "onnx.proto"],
                cwd=_HERE, check=True, capture_output=True, text=True,
            )
        except FileNotFoundError as e:  # pragma: no cover - protoc baked in
            raise RuntimeError(
                "protoc is required to build the local ONNX bindings "
                "(or install the `onnx` package)"
            ) from e
        except subprocess.CalledProcessError as e:  # pragma: no cover
            raise RuntimeError(f"protoc failed: {e.stderr}") from e
    spec = importlib.util.spec_from_file_location(
        "sam2unet_tpu.interop.onnx_compat._gen.onnx_pb2", gen_file
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    _pb2 = mod
    return mod


def have_real_onnx() -> bool:
    try:
        import onnx  # noqa: F401

        return not getattr(onnx, "__sam2unet_shim__", False)
    except ImportError:
        return False


def get_onnx():
    """Real `onnx` module if installed, else the local shim (registered so
    `import onnx` inside third-party code resolves to it)."""
    try:
        import onnx

        return onnx
    except ImportError:
        pass
    pb2 = _ensure_pb2()
    shim = types.ModuleType("onnx")
    shim.__sam2unet_shim__ = True
    shim.ModelProto = pb2.ModelProto
    shim.GraphProto = pb2.GraphProto
    shim.NodeProto = pb2.NodeProto
    shim.TensorProto = pb2.TensorProto
    shim.AttributeProto = pb2.AttributeProto
    shim.ValueInfoProto = pb2.ValueInfoProto
    shim.FunctionProto = pb2.FunctionProto
    shim.load_model_from_string = pb2.ModelProto.FromString
    shim.load = lambda path: load_model(path)
    shim.load_model = shim.load

    def _save(model, path):
        Path(path).write_bytes(model.SerializeToString())

    shim.save = _save
    sys.modules["onnx"] = shim
    return shim


def load_model_from_string(data: bytes):
    return get_onnx().load_model_from_string(data)


def load_model(path: str):
    return load_model_from_string(Path(path).read_bytes())


# TensorProto.DataType -> numpy dtype (bfloat16 handled separately: ONNX
# stores bf16 raw payloads as uint16 words)
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def tensor_to_array(t) -> np.ndarray:
    """TensorProto -> numpy array (the numpy_helper.to_array contract)."""
    dims = tuple(t.dims)
    dt = int(t.data_type)
    if dt == 16:  # bfloat16: widen via bit-shift into float32
        raw = np.frombuffer(t.raw_data, np.uint16) if t.raw_data else np.asarray(
            list(t.int32_data), np.uint16
        )
        return (raw.astype(np.uint32) << 16).view(np.float32).reshape(dims)
    if dt not in _DTYPES:
        raise NotImplementedError(f"TensorProto data_type {dt}")
    np_dt = _DTYPES[dt]
    if t.raw_data:
        return np.frombuffer(t.raw_data, np_dt).reshape(dims).copy()
    if dt in (1,):
        data = np.asarray(list(t.float_data), np.float32)
    elif dt in (7,):
        data = np.asarray(list(t.int64_data), np.int64)
    elif dt in (11,):
        data = np.asarray(list(t.double_data), np.float64)
    elif dt in (12, 13):
        data = np.asarray(list(t.uint64_data), np.uint64)
    else:  # int32 carries every narrow integral/bool/fp16 payload
        data = np.asarray(list(t.int32_data), np.int32)
        if dt == 10:
            # fp16 typed storage holds uint16 BIT PATTERNS, not values:
            # bit-cast, never value-cast (15360 -> 1.0, not 15360.0)
            return data.astype(np.uint16).view(np.float16).reshape(dims)
    return data.astype(np_dt).reshape(dims)


def attr_map(node) -> dict:
    """NodeProto attributes -> {name: python value}."""
    out = {}
    for a in node.attribute:
        ty = int(a.type)
        if ty == 1:
            out[a.name] = float(a.f)
        elif ty == 2:
            out[a.name] = int(a.i)
        elif ty == 3:
            out[a.name] = a.s.decode("utf-8")
        elif ty == 4:
            out[a.name] = tensor_to_array(a.t)
        elif ty == 5:
            out[a.name] = a.g
        elif ty == 6:
            out[a.name] = [float(v) for v in a.floats]
        elif ty == 7:
            out[a.name] = [int(v) for v in a.ints]
        elif ty == 8:
            out[a.name] = [s.decode("utf-8") for s in a.strings]
        else:
            raise NotImplementedError(f"attribute type {ty} ({a.name})")
    return out
