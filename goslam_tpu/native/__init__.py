"""Native (C++) runtime components, bound via ctypes.

Currently: isosurface extraction (marching tetrahedra) — the replacement
for the reference's external `mcubes` CUDA/C++ dependency.  The shared
library is built on demand with g++ and cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "marching.cpp")
_LIB = os.path.join(_DIR, "libmarching.so")

_lib = None


class _Mesh(ctypes.Structure):
    _fields_ = [
        ("verts", ctypes.POINTER(ctypes.c_float)),
        ("n_verts", ctypes.c_int64),
        ("tris", ctypes.POINTER(ctypes.c_int32)),
        ("n_tris", ctypes.c_int64),
    ]


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.mc_run.restype = ctypes.POINTER(_Mesh)
    lib.mc_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float,
    ]
    lib.mc_free.argtypes = [ctypes.POINTER(_Mesh)]
    _lib = lib
    return lib


def marching_cubes(grid: np.ndarray, iso: float = 0.0):
    """Extract the iso-surface of a 3D scalar field.

    Args:
      grid: [nx, ny, nz] float32 (C-contiguous).
      iso: iso value.
    Returns:
      (vertices [V, 3] float32 in voxel coords, triangles [T, 3] int32).
    """
    grid = np.ascontiguousarray(grid, np.float32)
    lib = _load()
    m = lib.mc_run(grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   grid.shape[0], grid.shape[1], grid.shape[2],
                   ctypes.c_float(iso))
    try:
        nv = m.contents.n_verts
        nt = m.contents.n_tris
        verts = np.ctypeslib.as_array(m.contents.verts,
                                      shape=(nv, 3)).copy() if nv else \
            np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(m.contents.tris,
                                     shape=(nt, 3)).copy() if nt else \
            np.zeros((0, 3), np.int32)
    finally:
        lib.mc_free(m)
    return verts, tris
