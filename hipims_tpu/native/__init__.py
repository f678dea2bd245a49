"""Native (C++) acceleration library with transparent Python fallback.

Builds raster_codec.cpp into a shared library on first use (g++ -O3) and
exposes it via ctypes.  Every entry point has a pure-Python/numpy fallback,
so the framework works without a toolchain; the native paths make large
raster I/O (10^7-10^8 cells) practical.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> Path | None:
    src = _HERE / "raster_codec.cpp"
    out = _HERE / "libhipims_raster.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        lib.hfa_decode_rlc.restype = ctypes.c_int
        lib.hfa_decode_rlc.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32)]
        lib.asc_format.restype = ctypes.c_int64
        lib.asc_format.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_char_p,
            ctypes.c_int64]
        _LIB = lib
        return _LIB


def decode_rlc_native(block: bytes, expected: int) -> np.ndarray | None:
    """RLC block decode via the native library; None -> use the fallback."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(expected, dtype=np.uint32)
    rc = lib.hfa_decode_rlc(
        block, len(block), expected,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc != 0:
        return None
    return out


def asc_format_native(data: np.ndarray, decimals: int = 6) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float64)
    rows, cols = data.shape
    cap = rows * cols * (decimals + 16) + rows + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.asc_format(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows, cols, decimals, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n]
