"""ctypes bindings for the native metric kernels (metrics/native/iou.cpp).

Built lazily with g++ on first import and cached next to the source (no
pybind11 in this environment — SURVEY.md §2.9 native plan). Import raises
ImportError when no compiler is available; callers fall back to the pure
Python path (metrics/polygon.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "iou.cpp")
_SO = os.path.join(_HERE, "native", "libdd_iou.so")


def _build():
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_SO))
    os.close(fd)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise ImportError(f"cannot build native IoU kernel: {e}") from e
    return _SO


_lib = ctypes.CDLL(_build())
_lib.masked_pair_iou.argtypes = [
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.POINTER(ctypes.c_double),
    ctypes.c_int64,
    ctypes.c_int64,
]
_lib.rasterize_boxes.argtypes = [
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int64,
]


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def masked_pair_iou(boxes1, boxes2, cond):
    """boxes1 [n1,2,4], boxes2 [n2,2,4] float64; cond [n1,n2] bool -> IoU matrix."""
    b1 = np.ascontiguousarray(boxes1, np.float64)
    b2 = np.ascontiguousarray(boxes2, np.float64)
    c = np.ascontiguousarray(cond, np.uint8)
    n1, n2 = len(b1), len(b2)
    out = np.zeros((n1, n2), np.float64)
    _lib.masked_pair_iou(
        _ptr(b1, ctypes.c_double), _ptr(b2, ctypes.c_double),
        _ptr(c, ctypes.c_uint8), _ptr(out, ctypes.c_double),
        n1, n2,
    )
    return out


def rasterize_boxes(boxes, valid=None, size=800):
    """Native host rasterizer: [n,2,4] meter boxes -> [size,size] uint8 map."""
    b = np.ascontiguousarray(boxes, np.float64)
    v = np.ascontiguousarray(valid, np.uint8) if valid is not None else None
    out = np.zeros((size, size), np.uint8)
    _lib.rasterize_boxes(
        _ptr(b, ctypes.c_double),
        _ptr(v, ctypes.c_uint8) if v is not None else None,
        len(b), _ptr(out, ctypes.c_uint8), size,
    )
    return out
