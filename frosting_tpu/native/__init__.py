"""Native (C++) runtime components, bound via ctypes.

Build with:  python -m frosting_tpu.native.build
The library is compiled once into this directory; loaders fall back to the
pure-Python implementations when the .so is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfrosting_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the native library with g++ (no external deps)."""
    src = os.path.join(os.path.dirname(__file__), "qem.cpp")
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                src, "-o", _LIB_PATH,
            ],
            check=True,
        )
    return _LIB_PATH


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.qem_decimate.restype = ctypes.c_int
        lib.qem_decimate.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def qem_decimate(
    verts: np.ndarray, faces: np.ndarray, target_vertices: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """QEM edge-collapse decimation. Returns None if the native lib is
    unavailable (callers fall back to vertex clustering)."""
    lib = load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv_out = ctypes.c_int64(0)
    nf_out = ctypes.c_int64(0)
    ok = lib.qem_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
        int(target_vertices),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(nv_out),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nf_out),
    )
    if not ok:
        return None
    return (
        out_v[: nv_out.value].copy(),
        out_f[: nf_out.value].copy(),
    )
