"""Native (C++) runtime components, bound via ctypes.

  * isosurface extraction (marching tetrahedra) — replaces the reference's
    external `mcubes` CUDA/C++ dependency.
  * depth rasterizer (z-buffer) — replaces the reference's pyrender
    offscreen depth pass used as the mesh-culling occlusion oracle
    (mesher.py:444-480).
  * greedy edge-proposal scan — the backend's distance-sorted NMS loop
    (reference backend.py:62-94); Python costs ~33 s per 2048-keyframe
    full-BA trigger on one core, C++ milliseconds.

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


_GREEDY_SRC = os.path.join(_DIR, "greedy.cpp")
_GREEDY_LIB = os.path.join(_DIR, "libgreedy.so")
_greedy_lib = None


def _load_greedy():
    global _greedy_lib
    if _greedy_lib is not None:
        return _greedy_lib
    if (not os.path.exists(_GREEDY_LIB)
            or os.path.getmtime(_GREEDY_LIB)
            < os.path.getmtime(_GREEDY_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _GREEDY_SRC,
             "-o", _GREEDY_LIB], check=True)
    lib = ctypes.CDLL(_GREEDY_LIB)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.greedy_propose.restype = ctypes.c_int64
    lib.greedy_propose.argtypes = [
        f64p, f64p,                                # d (mutated), rawd
        ctypes.c_int64, ctypes.c_int64,            # ilen, jlen
        ctypes.c_double, ctypes.c_int64,           # thresh, nms
        ctypes.c_int64, ctypes.c_int64,            # es_len0, max_factors
        ctypes.c_int32, ctypes.c_int64,            # loop, n_neigh
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # t_*_loop/start/end
        i32p, i32p, ctypes.c_int64,                # out_i, out_j, out_cap
        ctypes.POINTER(ctypes.c_int64),            # n_accepts_out
    ]
    _greedy_lib = lib
    return lib


def greedy_propose(d: np.ndarray, rawd: np.ndarray, thresh: float,
                   nms: int, es_len0: int, max_factors: int, loop: bool,
                   n_neigh: int, t_start_loop: int, t_start: int,
                   t_end: int):
    """Run the greedy NMS proposal scan over candidate matrix `d`.

    `d` ([ilen, jlen] float64, C-contiguous) is mutated by suppression,
    exactly like utils/greedy.greedy_nms_scan. Returns
    (pairs [N, 2] int32 of global (i, j) edges to append, n_accepts).
    """
    if d.dtype != np.float64 or not d.flags.c_contiguous:
        # survives python -O (an assert would not): the C scan mutates
        # `d` in place through a raw double*, so a silent dtype/stride
        # mismatch would mean OOB reads and garbage edges
        raise ValueError("greedy_propose needs a C-contiguous float64 "
                         f"matrix, got {d.dtype} "
                         f"(contiguous={d.flags.c_contiguous})")
    ilen, jlen = d.shape
    if loop:
        rawd = np.ascontiguousarray(rawd, np.float64)
    else:
        rawd = d  # unused in dense mode
    # one accept appends <= (2*n_neigh+1)^2 pairs (loop) or 2 (dense),
    # and the scan stops once es_len exceeds max_factors, so the final
    # accept can overshoot by at most one batch
    batch = (2 * n_neigh + 1) ** 2 if loop else 2
    cap = max(int(max_factors) - int(es_len0), 0) + batch + 8
    out_i = np.empty(cap, np.int32)
    out_j = np.empty(cap, np.int32)
    n_acc = ctypes.c_int64(0)
    lib = _load_greedy()
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    n = lib.greedy_propose(
        d.ctypes.data_as(f64p), rawd.ctypes.data_as(f64p),
        ilen, jlen, float(thresh), int(nms), int(es_len0),
        int(max_factors), int(bool(loop)), int(n_neigh),
        int(t_start_loop), int(t_start), int(t_end),
        out_i.ctypes.data_as(i32p), out_j.ctypes.data_as(i32p), cap,
        ctypes.byref(n_acc))
    if n < 0:
        raise RuntimeError("greedy_propose output buffer overflow")
    pairs = np.stack([out_i[:n], out_j[:n]], axis=1)
    return pairs, int(n_acc.value)


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
