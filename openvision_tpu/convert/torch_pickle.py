"""Torch-free reader for PyTorch `.bin` checkpoints (zip serialization).

`open_clip_pytorch_model.bin` files are `torch.save` zip archives: an
`archive/data.pkl` pickle whose tensors are rebuilt from flat storage blobs
(`archive/data/<key>`). Loading them previously hard-required torch
(tools/model_io.py; VERDICT r3 #9) — an odd dependency for a TPU-native
framework whose serving/encode path is pure JAX. This module unpickles the
state dict with a RESTRICTED unpickler (only the handful of names a torch
state dict legitimately contains; anything else raises) and materializes the
tensors as numpy arrays via `as_strided` over the raw storage bytes.

Scope: the standard zip format torch >= 1.6 writes (every HF/open_clip
`.bin` in the wild). The pre-1.6 tar format is not supported — callers fall
back to torch for that, if present.

Reference behavior mirrored: `torch.load(..., weights_only=True)`
(src/convert_upload/transfer_jax2hf.py loads checkpoints the same
restricted way).
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

# torch storage class name -> numpy dtype. BFloat16 maps through ml_dtypes
# (shipped with jax) since numpy has no native bfloat16.
_STORAGE_DTYPES = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _bfloat16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


class _StorageRef:
    """A lazy handle to one `archive/data/<key>` blob."""

    def __init__(self, dtype, key, numel):
        self.dtype = dtype
        self.key = key
        self.numel = numel
        self.array = None  # filled by the loader after unpickling starts


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    base = storage.array
    itemsize = base.dtype.itemsize
    return np.lib.stride_tricks.as_strided(
        base[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    ).copy()


def _rebuild_from_type_v2(func, new_type, args, state):
    # wraps plain tensors when the dict holds tensor subclasses; the
    # underlying rebuild is all we need
    return func(*args)


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file, fill):
        super().__init__(file)
        self._fill = fill  # called on each _StorageRef to load its bytes

    def find_class(self, module, name):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return ("dtype", _STORAGE_DTYPES[name])
        if module == "torch" and name == "BFloat16Storage":
            return ("dtype", _bfloat16())
        raise pickle.UnpicklingError(
            f"torch_pickle: refusing to unpickle {module}.{name} "
            "(not part of a plain tensor state dict)"
        )

    def persistent_load(self, pid):
        # ('storage', StorageClass-marker, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id: {pid!r}")
        _, dtype_marker, key, _location, numel = pid
        if not (isinstance(dtype_marker, tuple) and dtype_marker[0] == "dtype"):
            raise pickle.UnpicklingError(
                f"unsupported storage type marker: {dtype_marker!r}"
            )
        ref = _StorageRef(np.dtype(dtype_marker[1]), str(key), int(numel))
        self._fill(ref)
        return ref


def load_torch_bin(path: str) -> dict:
    """Loads a torch-zip `.bin` state dict as {name: np.ndarray} — no torch.

    Raises `pickle.UnpicklingError` on anything that is not a plain tensor
    state dict, and `zipfile.BadZipFile` on the pre-1.6 tar format.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(
            (n for n in names if n.endswith("/data.pkl")), None
        )
        if pkl_name is None:
            # A valid zip that is not a torch archive (e.g. mislabeled):
            # raise the same error class as a malformed pickle so callers'
            # torch-fallback paths (tools/model_io.py) stay reachable.
            raise pickle.UnpicklingError(
                f"{path}: zip archive has no */data.pkl — not a torch-zip "
                "state dict"
            )
        prefix = pkl_name[: -len("data.pkl")]

        def _fill(ref: _StorageRef):
            raw = zf.read(f"{prefix}data/{ref.key}")
            ref.array = np.frombuffer(raw, dtype=ref.dtype, count=ref.numel)

        unpickler = _RestrictedUnpickler(io.BytesIO(zf.read(pkl_name)), _fill)
        obj = unpickler.load()
    if isinstance(obj, (dict, OrderedDict)):
        return dict(obj)
    raise pickle.UnpicklingError(
        f"expected a state dict at {pkl_name}, got {type(obj)!r}"
    )
