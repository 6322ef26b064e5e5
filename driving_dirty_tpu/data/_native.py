"""ctypes bindings for the native image decoder (data/native/loader.cpp).

Built lazily with g++ on first import and cached next to the source, same
pattern as metrics/_native.py. Import raises ImportError when the compiler
or libjpeg/libpng dev headers are unavailable; callers fall back to the PIL
path (data/dataset.py::_load_image).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "loader.cpp")
_SO = os.path.join(_HERE, "native", "libdd_loader.so")


def _build():
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_SO))
    os.close(fd)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", tmp, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise ImportError(f"cannot build native image decoder: {e}") from e
    return _SO


_lib = ctypes.CDLL(_build())
_lib.dd_decode_image_u8.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
]
_lib.dd_decode_image_u8.restype = ctypes.c_int
_lib.dd_decode_image_f32.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
]
_lib.dd_decode_image_f32.restype = ctypes.c_int
_lib.dd_decode_batch.argtypes = [
    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32),
]
_lib.dd_decode_batch.restype = ctypes.c_int

_ERR = {-1: "cannot open", -2: "decode error", -3: "unexpected image shape"}


def _check(rc, path):
    if rc != 0:
        raise OSError(f"native decode failed for {path}: {_ERR.get(rc, rc)}")


def decode_image(path, h, w, raw_uint8=False, out=None):
    """Decode one JPEG/PNG into a [h, w, 3] RGB array (uint8, or f32 in [0,1]).

    `out` lets callers decode straight into a slice of a preallocated batch
    buffer (must be C-contiguous with the right dtype/shape).
    """
    if raw_uint8:
        if out is None:
            out = np.empty((h, w, 3), np.uint8)
        rc = _lib.dd_decode_image_u8(
            os.fsencode(path), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w
        )
    else:
        if out is None:
            out = np.empty((h, w, 3), np.float32)
        rc = _lib.dd_decode_image_f32(
            os.fsencode(path), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w
        )
    _check(rc, path)
    return out


def decode_batch(paths, h, w, raw_uint8=False, nthreads=0, out=None):
    """Decode N files into [n, h, w, 3] with a native thread pool.

    nthreads=0 picks min(n, cpu_count). Raises on the first failing file.
    """
    n = len(paths)
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    dtype = np.uint8 if raw_uint8 else np.float32
    if out is None:
        out = np.empty((n, h, w, 3), dtype)
    assert out.flags["C_CONTIGUOUS"] and out.dtype == dtype and out.shape == (n, h, w, 3)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    rc = _lib.dd_decode_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if raw_uint8 else None,
        None if raw_uint8 else out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, nthreads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        bad = int(np.nonzero(status)[0][0])
        _check(int(status[bad]), paths[bad])
    return out
