"""ctypes bindings for the native host library (native/cnrma_host.cpp).

The library is optional: every function has a numpy fallback, so the
framework works without compiling it; ``make -C native`` enables the fast
paths (OpenMP TSDF resampling in the loader, hash-map voxel downsample in
mesh eval).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libcnrma_host.so")
    if not os.path.isfile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.tsdf_resample.argtypes = [
            fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            fp, fp, fp, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, fp]
        lib.voxel_downsample.argtypes = [fp, ctypes.c_int,
                                         ctypes.c_float, fp]
        lib.voxel_downsample.restype = ctypes.c_int
        lib.nms_bev_aligned.argtypes = [fp, ctypes.c_int, ctypes.c_float,
                                        ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def tsdf_resample(vol: np.ndarray, transform: np.ndarray,
                  old_origin: np.ndarray, new_origin: np.ndarray,
                  voxel_size: float, out_dim) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    t = np.ascontiguousarray(transform, np.float32).reshape(16)
    oo = np.ascontiguousarray(old_origin, np.float32).reshape(3)
    no = np.ascontiguousarray(new_origin, np.float32).reshape(3)
    nx, ny, nz = (int(d) for d in out_dim)
    out = np.empty((nx, ny, nz), np.float32)
    lib.tsdf_resample(_cptr(vol), *vol.shape, _cptr(t), _cptr(oo),
                      _cptr(no), ctypes.c_float(voxel_size),
                      nx, ny, nz, _cptr(out))
    return out


def voxel_downsample(points: np.ndarray, voxel: float
                     ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    m = lib.voxel_downsample(_cptr(pts), len(pts),
                             ctypes.c_float(voxel), _cptr(out))
    return out[:m].copy()
