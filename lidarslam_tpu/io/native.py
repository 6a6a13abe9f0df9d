"""ctypes binding to the native host-ingest kernel (native/range_image.cpp).

Auto-builds the shared library on first use when a compiler is available;
callers fall back to the numpy path when the library cannot be loaded, so
the native layer is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO = os.path.join(_DIR, "liblidarslam_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO):
            subprocess.run(["bash", os.path.join(_DIR, "build.sh")], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        i64, i32, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
        p = ctypes.c_void_p
        lib.lst_build_range_image.restype = i64
        lib.lst_build_range_image.argtypes = [p, p, p, p, i64, i32, i32, p, p, p, p]
        lib.lst_build_range_image_packed.restype = i64
        lib.lst_build_range_image_packed.argtypes = [p, p, p, p, i64, i32, i32,
                                                     f32, p, p, p, p]
        if hasattr(lib, "lst_build_range_image_packed2"):
            lib.lst_build_range_image_packed2.restype = i64
            lib.lst_build_range_image_packed2.argtypes = [
                p, p, p, p, i64, i32, i32, f32, p, p, p, p, p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def build_range_image_native(xyz, intensity, laser_id, time, n_rings, max_ring_points):
    """-> (xyz (R,C,3) f32, intensity (R,C) f32, time (R,C) f32, valid (R,C) u8)
    or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    inten = np.ascontiguousarray(intensity, np.float32)
    lid = np.ascontiguousarray(laser_id, np.int32)
    t = np.ascontiguousarray(time, np.float32)
    R, C = n_rings, max_ring_points
    out_xyz = np.zeros((R, C, 3), np.float32)
    out_int = np.zeros((R, C), np.float32)
    out_time = np.zeros((R, C), np.float32)
    out_valid = np.zeros((R, C), np.uint8)
    lib.lst_build_range_image(_ptr(xyz), _ptr(inten), _ptr(lid), _ptr(t),
                              len(lid), R, C, _ptr(out_xyz), _ptr(out_int),
                              _ptr(out_time), _ptr(out_valid))
    return out_xyz, out_int, out_time, out_valid


def build_range_image_packed2_native(xyz, intensity, laser_id, time, n_rings,
                                     max_ring_points, scale):
    """-> (xyz_q (R,C,3) i16, intensity (R,C) u8, t_q (R,C) u8,
    t_min f32, t_scale f32, counts (R,) i32) — the windowed-streaming wire
    format, fully assembled in C++ — or None when unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "lst_build_range_image_packed2"):
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    inten = np.ascontiguousarray(intensity, np.float32)
    lid = np.ascontiguousarray(laser_id, np.int32)
    t = np.ascontiguousarray(time, np.float32)
    R, C = n_rings, max_ring_points
    out_xyz = np.zeros((R, C, 3), np.int16)
    out_int = np.zeros((R, C), np.uint8)
    out_tq = np.zeros((R, C), np.uint8)
    out_counts = np.zeros((R,), np.int32)
    tmeta = np.zeros((2,), np.float32)
    lib.lst_build_range_image_packed2(
        _ptr(xyz), _ptr(inten), _ptr(lid), _ptr(t), len(lid), R, C,
        1.0 / scale, _ptr(out_xyz), _ptr(out_int), _ptr(out_tq),
        _ptr(out_counts), _ptr(tmeta))
    return (out_xyz, out_int, out_tq, np.float32(tmeta[0]),
            np.float32(tmeta[1]), out_counts)


def build_range_image_packed_native(xyz, intensity, laser_id, time, n_rings,
                                    max_ring_points, scale):
    """-> (xyz_q (R,C,3) i16, intensity (R,C) u8, time (R,C) f16, valid u8)
    or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    inten = np.ascontiguousarray(intensity, np.float32)
    lid = np.ascontiguousarray(laser_id, np.int32)
    t = np.ascontiguousarray(time, np.float32)
    R, C = n_rings, max_ring_points
    out_xyz = np.zeros((R, C, 3), np.int16)
    out_int = np.zeros((R, C), np.uint8)
    out_time = np.zeros((R, C), np.uint16)
    out_valid = np.zeros((R, C), np.uint8)
    lib.lst_build_range_image_packed(_ptr(xyz), _ptr(inten), _ptr(lid), _ptr(t),
                                     len(lid), R, C, 1.0 / scale, _ptr(out_xyz),
                                     _ptr(out_int), _ptr(out_time), _ptr(out_valid))
    return out_xyz, out_int, out_time.view(np.float16), out_valid
