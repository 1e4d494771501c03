"""ctypes bindings for the C++ host ops (native/mobi_native.cpp).

The shared library is compiled on first use with g++ and cached next to the
source; every function has a pure-numpy fallback (`force_numpy=True` or when
no compiler is available) so the package never hard-fails.

Covered reference native-op families (bevfusion/mmdet3d/ops/):
  voxel (hard/dynamic voxelization), knn, ball_query,
  furthest_point_sample, interpolate (three_nn), roiaware_pool3d
  (points_in_boxes). gather/group are plain indexing — see `gather_points` /
  `group_points` below (numpy take, no native code needed on host).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "mobi_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(_SRC)),
                         "libmobi_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src = os.path.abspath(_SRC)
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
                     "-o", _LIB_PATH],
                    check=True, capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dynamic_voxelize.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p, _f32p, _i32p, _i32p,
        ]
        lib.hard_voxelize.restype = ctypes.c_int64
        lib.hard_voxelize.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p, _f32p, _i32p,
            ctypes.c_int64, ctypes.c_int64, _f32p, _i32p, _i32p,
        ]
        lib.knn.argtypes = [
            _f32p, ctypes.c_int64, _f32p, ctypes.c_int64, ctypes.c_int64,
            _i32p, _f32p,
        ]
        lib.ball_query.argtypes = [
            _f32p, ctypes.c_int64, _f32p, ctypes.c_int64, ctypes.c_float,
            ctypes.c_int64, _i32p,
        ]
        lib.furthest_point_sample.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _i32p,
        ]
        lib.three_nn.argtypes = [
            _f32p, ctypes.c_int64, _f32p, ctypes.c_int64, _f32p, _i32p,
        ]
        lib.points_in_boxes.argtypes = [
            _f32p, ctypes.c_int64, _f32p, ctypes.c_int64, _i32p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _grid_size(voxel_size, coors_range) -> np.ndarray:
    vs = np.asarray(voxel_size, np.float32)
    cr = np.asarray(coors_range, np.float32)
    return np.round((cr[3:] - cr[:3]) / vs).astype(np.int32)


# -------------------------------------------------------------- voxelization
def dynamic_voxelize(
    points: np.ndarray, voxel_size, coors_range, force_numpy: bool = False
) -> np.ndarray:
    """[N, >=3] points -> [N, 3] (x, y, z) grid coords, -1 if out of range
    (reference voxelization_cpu.cpp:7-43). The mmdet3d Python wrapper flips
    to (z, y, x); use coors[:, ::-1] for that convention."""
    pts = np.ascontiguousarray(points, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    cr = np.asarray(coors_range, np.float32)
    grid = _grid_size(vs, cr)
    lib = None if force_numpy else _load()
    if lib is not None:
        out = np.empty((len(pts), 3), np.int32)
        lib.dynamic_voxelize(pts, len(pts), pts.shape[1], vs, cr, grid, out)
        return out
    c = np.floor((pts[:, :3] - cr[:3]) / vs).astype(np.int32)
    bad = ((c < 0) | (c >= grid)).any(axis=1)
    c[bad] = -1
    return c


def hard_voxelize(
    points: np.ndarray, voxel_size, coors_range,
    max_points: int = 32, max_voxels: int = 20000, force_numpy: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """First-come-first-serve voxel grouping (voxelization_cpu.cpp:45-120).

    Returns (voxels [V, max_points, F], coors [V, 3] xyz grid indices,
    num_points_per_voxel [V])."""
    pts = np.ascontiguousarray(points, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    cr = np.asarray(coors_range, np.float32)
    grid = _grid_size(vs, cr)
    nf = pts.shape[1]
    lib = None if force_numpy else _load()
    if lib is not None:
        voxels = np.zeros((max_voxels, max_points, nf), np.float32)
        coors = np.zeros((max_voxels, 3), np.int32)
        npv = np.zeros((max_voxels,), np.int32)
        v = lib.hard_voxelize(pts, len(pts), nf, vs, cr, grid,
                              max_points, max_voxels, voxels, coors, npv)
        return voxels[:v], coors[:v], npv[:v]
    # numpy fallback mirrors the same first-come-first-serve semantics
    c = dynamic_voxelize(pts, vs, cr, force_numpy=True)
    voxels = np.zeros((max_voxels, max_points, nf), np.float32)
    coors = np.zeros((max_voxels, 3), np.int32)
    npv = np.zeros((max_voxels,), np.int32)
    vid_of = {}
    v = 0
    for i in range(len(pts)):
        if c[i, 0] < 0:
            continue
        key = tuple(c[i])
        vid = vid_of.get(key)
        if vid is None:
            if v >= max_voxels:
                continue
            vid = vid_of[key] = v
            coors[v] = c[i]
            v += 1
        if npv[vid] < max_points:
            voxels[vid, npv[vid]] = pts[i]
            npv[vid] += 1
    return voxels[:v], coors[:v], npv[:v]


# ----------------------------------------------------------------- point ops
def knn(ref: np.ndarray, query: np.ndarray, k: int,
        force_numpy: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """k nearest refs per query -> (idx [N, k], dist2 [N, k])."""
    r = np.ascontiguousarray(ref[:, :3], np.float32)
    q = np.ascontiguousarray(query[:, :3], np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        idx = np.empty((len(q), k), np.int32)
        d2 = np.empty((len(q), k), np.float32)
        lib.knn(r, len(r), q, len(q), k, idx, d2)
        return idx, d2
    d = ((q[:, None] - r[None]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k].astype(np.int32)
    return idx, np.take_along_axis(d, idx, 1).astype(np.float32)


def ball_query(ref: np.ndarray, query: np.ndarray, radius: float,
               nsample: int, force_numpy: bool = False) -> np.ndarray:
    """First `nsample` refs within `radius` per query, remaining slots repeat
    the first hit (mmdet3d ops/ball_query semantics)."""
    r = np.ascontiguousarray(ref[:, :3], np.float32)
    q = np.ascontiguousarray(query[:, :3], np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        idx = np.zeros((len(q), nsample), np.int32)
        lib.ball_query(r, len(r), q, len(q), radius, nsample, idx)
        return idx
    d = ((q[:, None] - r[None]) ** 2).sum(-1)
    idx = np.zeros((len(q), nsample), np.int32)
    for i in range(len(q)):
        hits = np.nonzero(d[i] < radius**2)[0][:nsample]
        if len(hits):
            idx[i, :] = hits[0]
            idx[i, : len(hits)] = hits
    return idx


def furthest_point_sample(points: np.ndarray, npoint: int,
                          force_numpy: bool = False) -> np.ndarray:
    """Iterative FPS seeded at index 0 -> [npoint] indices."""
    p = np.ascontiguousarray(points[:, :3], np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        idx = np.empty((npoint,), np.int32)
        lib.furthest_point_sample(p, len(p), npoint, idx)
        return idx
    idx = np.zeros(npoint, np.int32)
    mind = np.full(len(p), np.inf)
    cur = 0
    for s in range(npoint):
        idx[s] = cur
        mind = np.minimum(mind, ((p - p[cur]) ** 2).sum(-1))
        cur = int(np.argmax(mind))
    return idx


def three_nn(unknown: np.ndarray, known: np.ndarray,
             force_numpy: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """3 nearest knowns per unknown -> (dist2 [N, 3], idx [N, 3])."""
    idx, d2 = knn(known, unknown, 3, force_numpy=force_numpy)
    return d2, idx


def three_interpolate(features: np.ndarray, idx: np.ndarray,
                      dist2: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Inverse-distance weighted interpolation (ops/interpolate):
    features [M, C], idx/dist2 [N, 3] -> [N, C]."""
    w = 1.0 / (dist2 + eps)
    w = w / w.sum(axis=1, keepdims=True)
    return (features[idx] * w[..., None]).sum(axis=1)


def gather_points(features: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """features [N, C], idx [M] -> [M, C] (ops/gather_points)."""
    return features[idx]


def group_points(features: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """features [N, C], idx [M, K] -> [M, K, C] (ops/group_points)."""
    return features[idx]


def points_in_boxes(points: np.ndarray, boxes7d: np.ndarray,
                    force_numpy: bool = False) -> np.ndarray:
    """points [N, >=3] x boxes [B, 7] (cx, cy, cz_bottom, dx, dy, dz, yaw) ->
    [N] first containing box index or -1 (ops/roiaware_pool3d
    points_in_boxes_cpu semantics)."""
    p = np.ascontiguousarray(points[:, :3], np.float32)
    b = np.ascontiguousarray(boxes7d, np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        out = np.empty((len(p),), np.int32)
        lib.points_in_boxes(p, len(p), b, len(b), out)
        return out
    out = np.full(len(p), -1, np.int32)
    for bi in range(len(b)):
        cx, cy, cz, dx, dy, dz, yaw = b[bi]
        dzp = p[:, 2] - cz
        c, s = np.cos(-yaw), np.sin(-yaw)
        lx = (p[:, 0] - cx) * c - (p[:, 1] - cy) * s
        ly = (p[:, 0] - cx) * s + (p[:, 1] - cy) * c
        inside = (
            (dzp >= 0) & (dzp <= dz)
            & (np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2)
            & (out < 0)
        )
        out[inside] = bi
    return out
