"""Native (C++) runtime components, bound via ctypes.

  * isosurface extraction (marching tetrahedra) — replaces the reference's
    external `mcubes` CUDA/C++ dependency.
  * depth rasterizer (z-buffer) — replaces the reference's pyrender
    offscreen depth pass used as the mesh-culling occlusion oracle
    (mesher.py:444-480).

Shared libraries are built on demand with g++ and cached next to the
source.
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


# ---------------------------------------------------------------------------
# depth rasterizer
# ---------------------------------------------------------------------------

_RASTER_SRC = os.path.join(_DIR, "raster.cpp")
_RASTER_LIB = os.path.join(_DIR, "libraster.so")
_raster_lib = None


def _load_raster():
    global _raster_lib
    if _raster_lib is not None:
        return _raster_lib
    if (not os.path.exists(_RASTER_LIB)
            or os.path.getmtime(_RASTER_LIB)
            < os.path.getmtime(_RASTER_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _RASTER_SRC,
             "-o", _RASTER_LIB], check=True)
    lib = ctypes.CDLL(_RASTER_LIB)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.render_depth.restype = None
    lib.render_depth.argtypes = [
        f32p, ctypes.c_int64,                      # verts
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,  # tris
        f32p, ctypes.c_int64,                      # w2c, n_cams
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int,                # H, W
        ctypes.c_float, ctypes.c_float,            # znear, zfar
        f32p,                                      # out
    ]
    _raster_lib = lib
    return lib


def render_depth(verts: np.ndarray, tris: np.ndarray, w2c: np.ndarray,
                 intrinsics, H: int, W: int, znear: float = 0.001,
                 zfar: float = 20.0) -> np.ndarray:
    """Z-buffer depth render of (verts, tris) at each w2c camera.

    Args:
      verts: [V, 3] float32 world coords.
      tris: [T, 3] int32.
      w2c: [N, 4, 4] world->camera (OpenCV, +z forward).
      intrinsics: (fx, fy, cx, cy).
    Returns:
      [N, H, W] float32 depths, 0 where nothing was hit (the convention
      the reference's culling tests rely on, mesher.py:120).
    """
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    w2c = np.ascontiguousarray(w2c, np.float32).reshape(-1, 16)
    n_cams = len(w2c)
    fx, fy, cx, cy = [float(x) for x in intrinsics]
    out = np.zeros((n_cams, H, W), np.float32)
    if len(tris) == 0 or n_cams == 0:
        return out
    lib = _load_raster()
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.render_depth(
        verts.ctypes.data_as(f32p), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tris),
        w2c.ctypes.data_as(f32p), n_cams,
        fx, fy, cx, cy, H, W, znear, zfar,
        out.ctypes.data_as(f32p))
    return out
