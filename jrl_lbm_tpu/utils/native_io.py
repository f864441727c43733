"""ctypes bindings for the native Tecplot writer/reader.

The reference emits Tecplot dumps from a Python per-cell double loop
(`src/LBM/utils/io.py:319-333`), which costs seconds per 800x400 frame
and stalls the simulation's dump cadence. `native/tecplot_io.cc`
formats the whole zone in C++ (~50x faster); this module loads it via
ctypes, builds it on first use if a toolchain is available, and signals
absence so `utils.io` can fall back to the pure-Python writers.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "_native_io.so"


def _build() -> bool:
    src = pathlib.Path(__file__).parents[2] / "native" / "tecplot_io.cc"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o",
             str(_lib_path()), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not path.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None

    i64 = ctypes.c_int64
    fp = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    lib.tecplot_write_c_rho.argtypes = [ctypes.c_char_p, fp, fp, fp, fp, i64, i64]
    lib.tecplot_write_c_rho.restype = ctypes.c_int
    lib.tecplot_write_single.argtypes = [ctypes.c_char_p, fp, fp, fp, i64, i64]
    lib.tecplot_write_single.restype = ctypes.c_int
    lib.tecplot_read_dims.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(i64), ctypes.POINTER(i64)
    ]
    lib.tecplot_read_dims.restype = ctypes.c_int
    lib.tecplot_read_c_rho.argtypes = [ctypes.c_char_p, fp, fp, fp, fp, i64, i64]
    lib.tecplot_read_c_rho.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def write_c_rho(filename: str, C, rho, u, v) -> bool:
    """Native 'X Y C RHO U V NormX NormY' dump; returns False if the
    native path is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    C = np.ascontiguousarray(C, np.float32)
    rho = np.ascontiguousarray(rho, np.float32)
    u = np.ascontiguousarray(u, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    H, W = rho.shape
    rc = lib.tecplot_write_c_rho(
        filename.encode(), C, rho, u, v, H, W
    )
    return rc == 0


def write_single(filename: str, rho, u, v) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    rho = np.ascontiguousarray(rho, np.float32)
    u = np.ascontiguousarray(u, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    H, W = rho.shape
    rc = lib.tecplot_write_single(filename.encode(), rho, u, v, H, W)
    return rc == 0


def read_c_rho(filename: str):
    """Native reader; returns [C, rho, u, v] as [1,1,H,W] float32 (the
    reference reader's shape) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    H = ctypes.c_int64()
    W = ctypes.c_int64()
    if lib.tecplot_read_dims(filename.encode(), ctypes.byref(H), ctypes.byref(W)):
        return None
    H, W = H.value, W.value
    C = np.zeros((H, W), np.float32)
    rho = np.zeros((H, W), np.float32)
    u = np.zeros((H, W), np.float32)
    v = np.zeros((H, W), np.float32)
    if lib.tecplot_read_c_rho(filename.encode(), C, rho, u, v, H, W):
        return None
    return [a.reshape(1, 1, H, W) for a in (C, rho, u, v)]
