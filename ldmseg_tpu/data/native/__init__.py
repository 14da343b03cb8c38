"""ctypes bindings for the native data-path codec (bitcodec.cpp).

Compiled on first use with g++ (-O3 -march=native); every entry point has
a numpy fallback (ops/bits.py) so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "_bitcodec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    src = os.path.join(_HERE, "bitcodec.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        f32 = ctypes.c_float
        pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        pi = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.encode_bits_i32.argtypes = [pi, i64, ctypes.c_int, i32, f32, pf]
        lib.encode_bits_i32.restype = ctypes.c_int
        lib.decode_bits_i32.argtypes = [pf, i64, ctypes.c_int,
                                        ctypes.c_int, pi]
        lib.decode_bits_i32.restype = ctypes.c_int
        lib.remap_lut_i32.argtypes = [pi, i64, pi, i64, i32, pi]
        lib.remap_lut_i32.restype = ctypes.c_int
        _lib = lib
        return _lib


def encode_bits_native(x: np.ndarray, num_bits: int,
                       ignore_label: int | None = 0,
                       fill_value: float = 0.5) -> np.ndarray:
    """Native twin of ops.bits.encode_bits_np (bits only, no mask)."""
    lib = get_lib()
    x32 = np.ascontiguousarray(x, dtype=np.int32)
    if lib is None:
        from ...ops.bits import encode_bits_np
        return encode_bits_np(x, num_bits, ignore_label, fill_value)[0]
    out = np.empty(x32.shape + (num_bits,), dtype=np.float32)
    rc = lib.encode_bits_i32(
        x32.reshape(-1), x32.size, num_bits,
        -1 if ignore_label is None else int(ignore_label),
        float(fill_value), out.reshape(-1))
    assert rc == 0
    return out


def decode_bits_native(bits: np.ndarray,
                       invalid_to_zero: bool = True) -> np.ndarray:
    lib = get_lib()
    b32 = np.ascontiguousarray(bits, dtype=np.float32)
    if lib is None:
        from ...ops.bits import decode_bits_np
        return decode_bits_np(bits, invalid_to_zero=invalid_to_zero)
    out = np.empty(b32.shape[:-1], dtype=np.int32)
    rc = lib.decode_bits_i32(b32.reshape(-1), out.size, b32.shape[-1],
                             int(invalid_to_zero), out.reshape(-1))
    assert rc == 0
    return out


def remap_lut_native(ids: np.ndarray, lut: np.ndarray,
                     fallback: int = 0) -> np.ndarray:
    lib = get_lib()
    ids32 = np.ascontiguousarray(ids, dtype=np.int32)
    lut32 = np.ascontiguousarray(lut, dtype=np.int32)
    if lib is None:
        out = np.full(ids32.shape, fallback, dtype=np.int32)
        ok = (ids32 >= 0) & (ids32 < len(lut32))
        out[ok] = lut32[ids32[ok]]
        return out
    out = np.empty(ids32.shape, dtype=np.int32)
    rc = lib.remap_lut_i32(ids32.reshape(-1), ids32.size, lut32,
                           len(lut32), int(fallback), out.reshape(-1))
    assert rc == 0
    return out
