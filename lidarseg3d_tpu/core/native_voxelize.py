"""ctypes loader for the native C voxelizer (native/voxelize.c).

The host pipeline's hottest stage (31 ms/frame in vectorized numpy at
KITTI scale — STATUS host-budget table) drops to a few ms in C. Built on
first use with the system compiler (`cc -O2 -shared -fPIC`, no build
system, cached next to the source keyed by its mtime); every failure path
falls back to the numpy implementation, which remains the semantic
reference (byte-identical output asserted in tests/test_voxelize.py).
"""

import ctypes
import os
import os.path as osp
import subprocess
import tempfile

import numpy as np

_SRC = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "native",
                "voxelize.c")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        cache = osp.join(tempfile.gettempdir(),
                         f"l3d_voxelize_{os.getuid()}_"
                         f"{int(os.path.getmtime(_SRC))}.so")
        if not osp.isfile(cache):
            tmp = cache + f".{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
                check=True, capture_output=True)
            os.replace(tmp, cache)
        lib = ctypes.CDLL(cache)
        lib.voxelize_sorted.restype = ctypes.c_int64
        lib.voxelize_sorted.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return _load() is not None


def points_to_voxel_native(points, voxel_size, coors_range, max_points,
                           max_voxels, grid_size):
    """Key-sorted hard voxelization in C; returns (voxels, coors,
    num_points) like core.voxelize.points_to_voxel(sort_by_key=True), or
    None when the native path can't serve this input (no compiler,
    non-f32 points, or a grid whose linear key overflows uint32)."""
    lib = _load()
    points = np.ascontiguousarray(points)
    if (lib is None or points.dtype != np.float32
            or int(np.prod(grid_size)) >= 2 ** 32 or points.ndim != 2):
        return None
    n, d = points.shape
    vs = np.ascontiguousarray(voxel_size, np.float32)
    cr = np.ascontiguousarray(coors_range, np.float32)
    gs = np.ascontiguousarray(grid_size, np.int64)
    voxels = np.zeros((max_voxels, max_points, d), np.float32)
    coors = np.zeros((max_voxels, 3), np.int32)
    nump = np.zeros((max_voxels,), np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    nv = lib.voxelize_sorted(
        points.ctypes.data_as(f32p), n, d,
        vs.ctypes.data_as(f32p), cr.ctypes.data_as(f32p),
        max_points, max_voxels,
        gs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        voxels.ctypes.data_as(f32p), coors.ctypes.data_as(i32p),
        nump.ctypes.data_as(i32p),
    )
    if nv < 0:
        return None
    return voxels[:nv], coors[:nv], nump[:nv]
