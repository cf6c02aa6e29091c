"""Torch-free reader for torch zip-format checkpoints (.pt/.ckpt).

SURVEY §7 "hard parts": the released FitCLIP artifacts are torch saves, and
Lightning checkpoints embed pickled classes (the reference itself needs a stub
module hack, frozen_in_time.py:102-109). This reader deserializes them with a
*restricted* unpickler: tensor-rebuild opcodes map storages to numpy arrays
(bf16 via ml_dtypes), and any unknown global resolves to an inert stub type —
so arbitrary checkpoint pickles can neither execute code nor fail on missing
training-framework classes.

The torch-based loader (torch_state_dict.py) remains the default since torch
is available here; this is the standalone path.
"""

import io
import pickle
import pickletools  # noqa: F401  (documentation aid)
import zipfile
from typing import Any, Dict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": "bfloat16",
}


def _resolve_dtype(name: str):
    dtype = _STORAGE_DTYPES[name]
    if dtype == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(dtype)


class _StubObject:
    """Inert stand-in for unpicklable classes inside checkpoints (argparse
    Namespaces, Lightning callbacks, config objects...)."""

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __repr__(self):
        return f"<stub {self.__dict__.get('_stub_name', 'object')}>"


def _make_stub(module: str, name: str):
    return type(f"Stub_{name}", (_StubObject,), {"_stub_name": f"{module}.{name}"})


class _Storage:
    def __init__(self, data: bytes, dtype: np.dtype):
        self.array = np.frombuffer(data, dtype=dtype)


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    base = storage.array
    itemsize = base.dtype.itemsize
    if not size:
        return base[storage_offset].copy()
    strides_bytes = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        base[storage_offset:], shape=tuple(size), strides=strides_bytes)
    return view.copy()


class _RestrictedUnpickler(pickle.Unpickler):
    _ALLOWED = {
        ("collections", "OrderedDict"),
        ("builtins", "dict"), ("builtins", "list"), ("builtins", "set"),
        ("builtins", "tuple"), ("builtins", "frozenset"),
    }

    def __init__(self, file, archive: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self.archive = archive
        self.prefix = prefix

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED:
            return super().find_class(module, name)
        if module == "torch._utils" and name in ("_rebuild_tensor_v2",
                                                 "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return lambda data, requires_grad, hooks=None: data
        if module == "torch" and name.endswith("Storage"):
            return name  # consumed by persistent_load
        if module == "torch" and name in ("float32", "float16", "bfloat16",
                                          "float64", "int64", "int32", "uint8",
                                          "int8", "int16", "bool"):
            return name
        # Everything else (Lightning classes, argparse.Namespace, custom
        # configs) becomes an inert stub.
        return _make_stub(module, name)

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage", f"unknown persistent id {pid!r}"
        if not isinstance(storage_type, str):
            storage_type = getattr(storage_type, "__name__", str(storage_type))
        dtype = _resolve_dtype(storage_type)
        data = self.archive.read(f"{self.prefix}/data/{key}")
        return _Storage(data, dtype)


def load_pt(path: str) -> Any:
    """Load a torch zip-format save without torch. Tensors come back as numpy
    arrays (bf16 as ml_dtypes.bfloat16); unknown objects as stubs."""
    with zipfile.ZipFile(path) as archive:
        pickle_name = next(n for n in archive.namelist() if n.endswith("/data.pkl"))
        prefix = pickle_name[: -len("/data.pkl")]
        with archive.open(pickle_name) as f:
            unpickler = _RestrictedUnpickler(io.BytesIO(f.read()), archive, prefix)
            return unpickler.load()


def load_pt_state_dict(path: str, strip_prefix: str = "") -> Dict[str, np.ndarray]:
    """Flattened {name: float32 ndarray} view of a checkpoint, unwrapping
    Lightning-style {"state_dict": ...} and applying an optional key-prefix
    filter (util/checkpoint_utils.py:9-12 semantics)."""
    obj = load_pt(path)
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out: Dict[str, np.ndarray] = {}
    for key, value in obj.items():
        if strip_prefix:
            if not str(key).startswith(strip_prefix):
                continue
            key = str(key)[len(strip_prefix):]
        if isinstance(value, np.ndarray) or np.isscalar(value):
            out[str(key)] = np.asarray(value, dtype=np.float32)
    return out
