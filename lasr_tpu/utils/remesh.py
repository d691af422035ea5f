"""Watertight remesh + simplify (stage-transition retopology).

Replaces the reference's external Manifold/simplify binaries
(ref:nnutils/train_utils.py:419-428, github hjwdzh/Manifold): between
coarse-to-fine stages the optimized mesh is re-topologized to a clean
watertight triangulation with a target face count.  Implemented natively in
C++ (native/remesh): SDF voxelization -> marching cubes -> quadric-error
simplification, exposed through ctypes.  Host-side; runs once per stage.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "build", "libremesh.so")


def _load():
    global _LIB
    if _LIB is None:
        path = os.path.abspath(_LIB_PATH)
        if not os.path.exists(path):
            return None
        _LIB = ctypes.CDLL(path)
        _LIB.remesh_simplify.restype = ctypes.c_int
        _LIB.remesh_simplify.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # verts, n_verts
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,        # faces, n_faces
            ctypes.c_int,                                       # grid resolution
            ctypes.c_int,                                       # target faces
            ctypes.POINTER(ctypes.c_float),                     # out verts buf
            ctypes.POINTER(ctypes.c_int),                       # out faces buf
            ctypes.POINTER(ctypes.c_int),                       # out counts [2]
            ctypes.c_int,                                       # buf capacity
        ]
    return _LIB


def remesh(verts: np.ndarray, faces: np.ndarray, target_faces: int,
           grid: int = 128):
    """Returns (new_verts [V', 3] f32, new_faces [F', 3] i64) with
    F' <= target_faces, watertight."""
    lib = _load()
    if lib is None:
        import warnings
        warnings.warn("native remesher not built (run `make -C native`); "
                      "keeping the original topology")
        return verts.astype(np.float32), faces.astype(np.int64)

    verts = np.ascontiguousarray(verts, np.float32)
    faces32 = np.ascontiguousarray(faces, np.int32)
    cap = max(grid ** 2 * 12, target_faces * 8, 1 << 18)
    out_v = np.zeros((cap, 3), np.float32)
    out_f = np.zeros((cap, 3), np.int32)
    counts = np.zeros(2, np.int32)
    rc = lib.remesh_simplify(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces32.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(faces32),
        grid, int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), cap)
    if rc != 0:
        raise RuntimeError(f"native remesher failed with code {rc}")
    nv, nf = int(counts[0]), int(counts[1])
    return out_v[:nv].copy(), out_f[:nf].astype(np.int64).copy()
