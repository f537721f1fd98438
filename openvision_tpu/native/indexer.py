"""ctypes bindings for the native shard indexer (libindexer.so).

`tar_index(path)` → list[(name, offset, size)] for regular files;
`tfrecord_index(path)` → list[(offset, size)] of record payloads.
Both return None when the shared library is unavailable — callers fall back
to the pure-Python scan (tarfile / struct walk in data/pipeline.py).
"""

from __future__ import annotations

import ctypes
import os

HERE = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(HERE, "libindexer.so")


def _load_lib():
    if os.environ.get("OPENVISION_NO_NATIVE") or not os.path.exists(LIB_PATH):
        return None
    lib = ctypes.CDLL(LIB_PATH)
    lib.tar_index.restype = ctypes.c_long
    lib.tar_index.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_char_p,
        ctypes.c_long, ctypes.c_long,
    ]
    lib.tfrecord_index.restype = ctypes.c_long
    lib.tfrecord_index.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_long,
    ]
    return lib


_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _load_lib()
        except Exception:
            _LIB = None
    return _LIB


def tar_index(path: str):
    lib = _lib()
    if lib is None:
        return None
    # headers are 512B apart, so entries <= filesize/512; names bounded too
    fsize = os.path.getsize(path)
    cap = max(16, fsize // 512 + 2)
    offsets = (ctypes.c_long * cap)()
    sizes = (ctypes.c_long * cap)()
    names_cap = cap * 260
    names = ctypes.create_string_buffer(names_cap)
    n = lib.tar_index(os.fsencode(path), offsets, sizes, names, cap, names_cap)
    if n < 0:
        return None
    out = []
    pos = 0
    raw = names.raw
    for i in range(n):
        end = raw.index(b"\x00", pos)
        out.append((raw[pos:end].decode("utf-8", "replace"),
                    offsets[i], sizes[i]))
        pos = end + 1
    return out


def tfrecord_index(path: str):
    lib = _lib()
    if lib is None:
        return None
    fsize = os.path.getsize(path)
    cap = max(16, fsize // 16 + 2)
    offsets = (ctypes.c_long * cap)()
    sizes = (ctypes.c_long * cap)()
    n = lib.tfrecord_index(os.fsencode(path), offsets, sizes, cap)
    if n < 0:
        return None
    return [(offsets[i], sizes[i]) for i in range(n)]
