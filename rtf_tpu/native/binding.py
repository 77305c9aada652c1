"""ctypes binding to librtf_native.so (C++ BVH builder + PNG unfilter).

The library is compiled on first use (make in this directory); every
entry point has a pure-Python fallback, so the framework works without a
toolchain — the native path is the production one for large meshes and
big textures.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "librtf_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def get_lib():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _HERE], check=True,
                               capture_output=True, timeout=120)
            except (subprocess.SubprocessError, OSError):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rtf_bvh_build.restype = ctypes.c_int32
        lib.rtf_bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32]
        lib.rtf_bvh_read.argtypes = [ctypes.POINTER(ctypes.c_float)] * 2 + [
            ctypes.POINTER(ctypes.c_int32)] * 4
        lib.rtf_png_unfilter.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        _lib = lib
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def native_build_bvh(centers, bmin, bmax, max_elems: int):
    """C++ BVH build; returns the same tuple layout as ops.bvh.build_bvh
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(centers)
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    centers = np.ascontiguousarray(centers, np.float64)
    with _lock:
        num_nodes = lib.rtf_bvh_build(
            _fptr(bmin), _fptr(bmax),
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, max_elems)
        node_min = np.empty((num_nodes, 3), np.float32)
        node_max = np.empty((num_nodes, 3), np.float32)
        child = np.empty(num_nodes, np.int32)
        eoff = np.empty(num_nodes, np.int32)
        ecnt = np.empty(num_nodes, np.int32)
        elems = np.empty(n, np.int32)
        lib.rtf_bvh_read(_fptr(node_min), _fptr(node_max), _iptr(child),
                         _iptr(eoff), _iptr(ecnt), _iptr(elems))
        lib.rtf_bvh_free()
    return node_min, node_max, child, eoff, ecnt, elems


def native_png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int):
    """C++ scanline unfilter; returns [h, stride] uint8 or None."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty((h, stride), np.uint8)
    with _lock:
        lib.rtf_png_unfilter(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, stride, bpp)
    return out
