"""ctypes binding to the native marching-cubes library (native/marching_cubes.cpp).

Replaces the reference's PyMCubes usage (renderer.py:342-343). The shared library
auto-builds with make/g++ on first use; build products cache next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhlmc.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hl_marching_cubes.restype = ctypes.c_int
    lib.hl_marching_cubes.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hl_smooth.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.hl_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def smooth_grid(grid: np.ndarray, iters: int = 1) -> np.ndarray:
    """In-place-style box smoothing (mcubes.smooth equivalent); returns a new array."""
    lib = _load()
    g = np.ascontiguousarray(grid, np.float32).copy()
    nx, ny, nz = g.shape
    lib.hl_smooth(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz, iters
    )
    return g


def marching_cubes(
    grid: np.ndarray, iso: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface; returns (verts (V,3) in grid coords, tris (T,3))."""
    lib = _load()
    g = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = g.shape
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.hl_marching_cubes(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(nv),
        ctypes.byref(tp), ctypes.byref(nt),
    )
    if rc != 0:
        raise RuntimeError("marching cubes failed (out of memory?)")
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
        tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    finally:
        lib.hl_free(ctypes.cast(vp, ctypes.c_void_p))
        lib.hl_free(ctypes.cast(tp, ctypes.c_void_p))
    return verts, tris
