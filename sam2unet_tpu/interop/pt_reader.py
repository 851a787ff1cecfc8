"""Minimal torch-free reader for PyTorch zip checkpoints (.pt/.pth).

A torch-saved file is a zip holding `data.pkl` (a pickle whose tensors are
persistent-id references) plus one raw little-endian buffer per storage.
This restricted unpickler resolves those references straight into numpy —
no torch import, no arbitrary-code unpickling (only a whitelist of
torch rebuild functions is honored; everything else raises).
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially below
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _bf16_to_f32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


class _Storage:
    def __init__(self, data: np.ndarray):
        self.data = data


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *unused):
    arr = storage.data
    if not size:
        return arr[storage_offset].copy() if arr.size else arr
    # bounds-check BEFORE building the strided view: a truncated/crafted
    # data.pkl can declare shapes far beyond the storage buffer, and
    # as_strided would happily read out-of-bounds process memory (this is
    # a restricted reader — fail loudly instead)
    if any(sz <= 0 for sz in size):
        return np.zeros(tuple(size), arr.dtype)
    if any(st < 0 for st in stride):
        raise pickle.UnpicklingError(
            f"negative tensor strides {tuple(stride)} (restricted reader)"
        )
    max_elem = storage_offset + sum(
        (sz - 1) * st for sz, st in zip(size, stride)
    )
    if storage_offset < 0 or max_elem >= arr.size:
        raise pickle.UnpicklingError(
            f"tensor view (offset {storage_offset}, size {tuple(size)}, "
            f"stride {tuple(stride)}) exceeds its {arr.size}-element storage"
        )
    # build a strided view (strides are in elements)
    itemsize = arr.dtype.itemsize
    byte_strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=byte_strides
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(tensor, requires_grad=None, hooks=None):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self.zf = zf
        self.prefix = prefix
        self._storages: dict[str, _Storage] = {}

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unsupported persistent id {typename}")
        storage_type, key, _location, _numel = pid[1], pid[2], pid[3], pid[4]
        if key in self._storages:
            return self._storages[key]
        name = (
            storage_type.__name__
            if hasattr(storage_type, "__name__")
            else str(storage_type)
        )
        raw = self.zf.read(f"{self.prefix}/data/{key}")
        if name in ("BFloat16Storage",):
            data = _bf16_to_f32(raw)
        else:
            np_dtype = _DTYPES.get(name)
            if np_dtype is None:
                # unknown storage (complex/quantized/future types): raising
                # beats silently reinterpreting the bytes as float32
                raise pickle.UnpicklingError(
                    f"unsupported storage type {name} (restricted reader)"
                )
            data = np.frombuffer(raw, dtype=np_dtype)
        st = _Storage(data)
        self._storages[key] = st
        return st

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module.startswith("torch") and name.endswith("Storage"):
            # stand-in class carrying only its name for dtype mapping
            return type(name, (), {"__name__": name})
        if module == "torch" and name in ("bfloat16", "float32", "float16",
                                          "float64", "int64", "int32", "uint8",
                                          "bool"):
            return name
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} (restricted reader)"
        )


def read_pt(path: str) -> dict:
    """Load a torch zip checkpoint into a (possibly nested) dict of numpy."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path} is not a torch zip checkpoint")
        prefix = pkl_names[0][: -len("/data.pkl")]
        with zf.open(pkl_names[0]) as f:
            up = _Unpickler(io.BytesIO(f.read()), zf, prefix)
            obj = up.load()
    return obj
