"""ctypes bindings for the native runtime components.

Builds gifenc.cpp with the system C++ toolchain on first use (no pybind11 in
this environment; the CPython-free C ABI + ctypes keeps the binding
dependency-free). All entry points degrade gracefully: if the toolchain or
the .so is unavailable, callers fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gifenc.cpp")
_SO = os.path.join(_HERE, "_cfp_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.cfp_write_gif.restype = ctypes.c_int
            lib.cfp_write_gif.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def write_gif(path: str, frames: Sequence[np.ndarray], fps: float) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native gif encoder unavailable")
    stack = np.ascontiguousarray(np.stack(frames).astype(np.uint8))
    n, h, w, _ = stack.shape
    delay = max(2, int(round(100.0 / fps)))
    rc = lib.cfp_write_gif(
        path.encode(), stack.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, delay,
    )
    if rc != 0:
        raise RuntimeError(f"cfp_write_gif failed with code {rc}")
