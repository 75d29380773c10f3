"""FLAC decoding via the native C++ decoder (native/flac_decoder.cpp).

The shared library is built on first use with g++ (no packaging deps) and
cached next to the source.  ``read_flac(path) -> (mono_float32, rate)``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "flac_decoder.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libflacdec.so"))


def _build() -> str:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True)
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            lib.flacdec_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.flacdec_decode.restype = ctypes.c_int
            lib.flacdec_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            _LIB = lib
    return _LIB


def decode_flac_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    lib = _lib()
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.flacdec_decode(data, len(data), ctypes.byref(out),
                            ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc})")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.flacdec_free(out)
    return arr, int(sr.value)


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as fh:
        return decode_flac_bytes(fh.read())
