"""ctypes bindings for the native WordPiece tokenizer (libwordpiece.so).

`load_native(vocab_path)` returns a NativeWordPiece with `.encode(text)`
matching data/tokenizer.py's WordPieceTokenizer.encode exactly, or None when
the shared library is unavailable (pure-Python fallback stays in charge).

The one documented semantic difference vs Python: str.lower()'s
context-dependent Greek final-sigma rule (Σ at word end → ς) is per-character
in the mapping table, so texts containing U+03A3 are routed back to the
Python path by the caller.
"""

from __future__ import annotations

import ctypes
import os

HERE = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(HERE, "libwordpiece.so")

# characters whose lowercasing is context-dependent in Python str.lower
CONTEXT_SENSITIVE = "Σ"  # GREEK CAPITAL LETTER SIGMA

_MAX_IDS = 8192


class NativeWordPiece:
    def __init__(self, lib: ctypes.CDLL, handle: ctypes.c_void_p):
        self._lib = lib
        self._h = handle
        self._buf = (ctypes.c_int32 * _MAX_IDS)()

    def encode(self, text: str) -> list[int] | None:
        """Token ids, or None when the result exceeds the native buffer
        (very long texts) — the caller must fall back to the Python path
        so both paths tokenize identically at any length."""
        n = self._lib.wp_encode(
            self._h, text.encode("utf-8"), self._buf, _MAX_IDS
        )
        if n > _MAX_IDS:
            return None
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.wp_free(self._h)
        except Exception:
            pass


def _load_lib():
    if not os.path.exists(LIB_PATH):
        return None
    lib = ctypes.CDLL(LIB_PATH)
    lib.wp_load.restype = ctypes.c_void_p
    lib.wp_load.argtypes = [ctypes.c_char_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode.restype = ctypes.c_int
    lib.wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    return lib


def load_native(vocab_path: str) -> NativeWordPiece | None:
    if os.environ.get("OPENVISION_NO_NATIVE"):
        return None
    lib = _load_lib()
    if lib is None:
        return None
    h = lib.wp_load(os.fsencode(vocab_path))
    if not h:
        return None
    return NativeWordPiece(lib, ctypes.c_void_p(h))
