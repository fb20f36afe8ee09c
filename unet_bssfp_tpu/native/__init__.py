"""ctypes bindings for the native NIfTI codec (``nifti_native.cpp``).

Builds ``libnifti_native.so`` on first use (g++ -O3 -shared, linked against
zlib) and caches it next to the source. ctypes foreign calls release the GIL,
so ``data.queue.parallel_map`` threads decompress concurrently — the native
replacement for the reference's 8-process TorchIO loader fan-out
(``src/data_module.py:152-166``). Falls back cleanly when no toolchain is
available (``is_available()`` returns False; ``data.nifti`` then uses the
pure-Python codec or nibabel).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nifti_native.cpp")
_LIB = os.path.join(_DIR, "libnifti_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-o", _LIB, "-lz",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(
            _LIB
        ) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.nifti_read_f32.restype = ctypes.c_int64
        lib.nifti_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.nifti_read_header.restype = ctypes.c_int
        lib.nifti_read_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.nifti_write_f32.restype = ctypes.c_int
        lib.nifti_write_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _affine_from_srow(srow: np.ndarray) -> np.ndarray:
    affine = np.eye(4)
    if np.any(srow):
        affine[:3, :] = srow.reshape(3, 4)
    return affine


def read_volume(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a NIfTI file natively → (float32 array, (4,4) affine)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native nifti codec unavailable")
    dims = (ctypes.c_int64 * 8)()
    affine = (ctypes.c_double * 12)()
    datatype = ctypes.c_int()
    rc = lib.nifti_read_header(path.encode(), dims, affine,
                               ctypes.byref(datatype))
    if rc != 0:
        raise IOError(f"nifti_read_header({path!r}) failed: {rc}")
    ndim = dims[0]
    count = 1
    for i in range(1, ndim + 1):
        count *= dims[i]
    out = np.empty(count, np.float32)
    n = lib.nifti_read_f32(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count,
        dims,
        affine,
    )
    if n < 0:
        raise IOError(f"nifti_read_f32({path!r}) failed: {n}")
    shape = tuple(dims[i] for i in range(1, ndim + 1))
    data = out[:n].reshape(shape, order="F")
    return data, _affine_from_srow(np.asarray(affine))


def write_volume(path: str, data: np.ndarray, affine: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native nifti codec unavailable")
    data = np.asfortranarray(data, np.float32)
    dims = (ctypes.c_int64 * 8)()
    dims[0] = data.ndim
    for i, s in enumerate(data.shape, 1):
        dims[i] = s
    aff = np.ascontiguousarray(np.asarray(affine, np.float64)[:3, :]).ravel()
    rc = lib.nifti_write_f32(
        path.encode(),
        data.ravel(order="F").ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims,
        aff.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise IOError(f"nifti_write_f32({path!r}) failed: {rc}")
