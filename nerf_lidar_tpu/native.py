"""ctypes bindings to the native host-side LiDAR kernels.

Builds native/liblidar_native.so on demand (g++ only, no pybind11) and
exposes numpy-facing wrappers. Every entry point has a pure-numpy fallback
(the implementations in lidar/range_image.py and raydrop/features.py), so
the framework works without a compiler; call `available()` to check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_MESH_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _build(stem: str = "lidar_native") -> Optional[str]:
    so = os.path.join(_NATIVE_DIR, f"lib{stem}.so")
    src = os.path.join(_NATIVE_DIR, f"{stem}.cpp")
    if os.path.exists(so) and (not os.path.exists(src)
                               or os.path.getmtime(so)
                               >= os.path.getmtime(src)):
        return so
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-o", so, src],
            check=True, capture_output=True)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.decode_bin.restype = ctypes.c_int
    lib.decode_bin.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                               ctypes.c_float, f32p, f32p, f32p]
    lib.range_project.restype = None
    lib.range_project.argtypes = [f32p, f32p, f32p, ctypes.c_int64,
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.c_float, ctypes.c_float,
                                  f32p, f32p, f32p, i64p, i32p, i32p]
    lib.depth_filter.restype = None
    lib.depth_filter.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_float, ctypes.c_int,
                                 u8p]
    _LIB = lib
    return lib


def _load_mesh():
    global _MESH_LIB
    if _MESH_LIB is not None:
        return _MESH_LIB
    so = _build("mesh_native")
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.qem_decimate.restype = ctypes.c_int
    lib.qem_decimate.argtypes = [f64p, ctypes.c_int64, i64p,
                                 ctypes.c_int64, ctypes.c_int64, f64p,
                                 i64p, i64p]
    _MESH_LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def mesh_available() -> bool:
    return _load_mesh() is not None


def qem_decimate(verts: np.ndarray, faces: np.ndarray, target: int
                 ) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Quadric-edge-collapse decimation (native/mesh_native.cpp).

    verts [V,3], faces [F,3] -> (verts' [V',3] f64, faces' [F',3] i64,
    reached) where `reached` is False if the flip guard drained the edge
    heap before hitting <= target faces.
    """
    lib = _load_mesh()
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    counts = np.zeros(2, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.qem_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), v.shape[0],
        f.ctypes.data_as(i64p), f.shape[0], int(target),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_f.ctypes.data_as(i64p), counts.ctypes.data_as(i64p))
    nv, nf = int(counts[0]), int(counts[1])
    return out_v[:nv].copy(), out_f[:nf].copy(), rc == 0


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_bin(scan: np.ndarray, d_min: float = 3.0, d_max: float = 100.0
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """scan: [N, 5] float32 -> (xyz [K,3], intensity [K], depth [K])."""
    lib = _load()
    scan = np.ascontiguousarray(scan, np.float32)
    n = scan.shape[0]
    xyz = np.empty((n, 3), np.float32)
    inten = np.empty(n, np.float32)
    depth = np.empty(n, np.float32)
    k = lib.decode_bin(_fptr(scan), n, d_min, d_max, _fptr(xyz),
                       _fptr(inten), _fptr(depth))
    return xyz[:k].copy(), inten[:k].copy(), depth[:k].copy()


def range_project(points: np.ndarray, semantic: Optional[np.ndarray] = None,
                  rgb: Optional[np.ndarray] = None, h: int = 32,
                  w: int = 1024, fov_up: float = 10.67,
                  fov_down: float = -30.67):
    """Native nearest-depth spherical projection. Returns dict matching
    lidar.range_image.project_points fields."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    sem_in = (np.ascontiguousarray(semantic, np.float32)
              if semantic is not None else None)
    rgb_in = (np.ascontiguousarray(rgb, np.float32)
              if rgb is not None else None)
    out_range = np.empty((h, w), np.float32)
    out_sem = np.empty((h, w), np.float32)
    out_rgb = np.empty((h, w, 3), np.float32)
    out_idx = np.empty((h, w), np.int64)
    out_px = np.empty(n, np.int32)
    out_py = np.empty(n, np.int32)
    lib.range_project(
        _fptr(points),
        _fptr(sem_in) if sem_in is not None else None,
        _fptr(rgb_in) if rgb_in is not None else None,
        n, h, w, fov_up, fov_down, _fptr(out_range), _fptr(out_sem),
        _fptr(out_rgb), out_idx.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        out_px.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_py.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    mask = (out_idx >= 0).astype(np.float32)
    return dict(range=out_range, semantic=out_sem, rgb=out_rgb,
                idx=out_idx, mask=mask, proj_x=out_px, proj_y=out_py)


def depth_filter_mask(points: np.ndarray,
                      semantic: Optional[np.ndarray] = None,
                      num_beams: int = 32, width: int = 3,
                      radius: float = 1.0, threshold: int = 1) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32).reshape(num_beams, -1, 3)
    per_beam = pts.shape[1]
    sem = (np.ascontiguousarray(semantic, np.float32)
           if semantic is not None else None)
    keep = np.empty(num_beams * per_beam, np.uint8)
    lib.depth_filter(
        _fptr(pts), _fptr(sem) if sem is not None else None,
        num_beams, per_beam, width, radius, threshold,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)
