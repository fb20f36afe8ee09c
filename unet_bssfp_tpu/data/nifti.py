"""NIfTI host I/O, channels-last.

This environment ships no nibabel, so the framework carries its own minimal
NIfTI-1 codec (348-byte header + raw data, plain or gzip): enough for the
reference pipeline's needs — float volumes, dim/affine round-trip
(``src/eval.py`` and ``src/model.py:335-357`` only ever read data + affine).
nibabel is used transparently when importable (real-world BIDS datasets with
exotic encodings).

NIfTI stores spatial-first with trailing channel dim, matching the framework's
on-device layout — unlike the reference, which moves axes between NCDHW and
disk layout (``src/model.py:344-346``). Saved predictions keep the source
affine (the reference drops it to ``np.eye(4)``, ``src/model.py:349`` —
defect #6 in SURVEY.md §7, fixed here).
"""

from __future__ import annotations

import gzip
import struct
from typing import Optional, Tuple

import numpy as np

try:  # pragma: no cover - exercised only where nibabel exists
    import nibabel as nib

    HAS_NIBABEL = True
except Exception:
    nib = None
    HAS_NIBABEL = False


_DTYPE_CODES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
}
_CODES_DTYPE = {np.dtype(v): k for k, v in _DTYPE_CODES.items()}

_HDR_SIZE = 348


def _read_bytes(path: str) -> bytes:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def _parse_header(buf: bytes):
    sizeof_hdr = struct.unpack_from("<i", buf, 0)[0]
    endian = "<"
    if sizeof_hdr != _HDR_SIZE:
        endian = ">"
        sizeof_hdr = struct.unpack_from(">i", buf, 0)[0]
        if sizeof_hdr != _HDR_SIZE:
            raise ValueError("not a NIfTI-1 file")
    dim = struct.unpack_from(endian + "8h", buf, 40)
    datatype = struct.unpack_from(endian + "h", buf, 70)[0]
    vox_offset = struct.unpack_from(endian + "f", buf, 108)[0]
    scl_slope = struct.unpack_from(endian + "f", buf, 112)[0]
    scl_inter = struct.unpack_from(endian + "f", buf, 116)[0]
    srow = np.array(
        struct.unpack_from(endian + "12f", buf, 280), np.float64
    ).reshape(3, 4)
    ndim = dim[0]
    shape = tuple(dim[1 : 1 + max(ndim, 1)])
    return endian, shape, datatype, int(vox_offset), scl_slope, scl_inter, srow


def _builtin_load(path: str, dtype=np.float32):
    buf = _read_bytes(path)
    endian, shape, datatype, vox_offset, slope, inter, srow = _parse_header(buf)
    np_dtype = np.dtype(_DTYPE_CODES[datatype]).newbyteorder(endian)
    count = int(np.prod(shape)) if shape else 0
    data = np.frombuffer(
        buf, dtype=np_dtype, count=count, offset=vox_offset
    ).reshape(shape, order="F")
    data = data.astype(dtype)
    # NIfTI-1 scaling: applied unless slope is 0/NaN; a nonzero intercept
    # matters even at slope 1 (common CT/MR convention).
    if (
        not np.isnan(slope)
        and slope != 0.0
        and (slope != 1.0 or inter != 0.0)
    ):
        data = data * slope + inter
    affine = np.eye(4)
    if np.any(srow):
        affine[:3, :] = srow
    return data, affine


def _builtin_save(path: str, data: np.ndarray, affine: np.ndarray) -> None:
    data = np.ascontiguousarray(data)
    if data.dtype not in _CODES_DTYPE:
        data = data.astype(np.float32)
    code = _CODES_DTYPE[np.dtype(data.dtype)]
    ndim = data.ndim
    dim = [ndim] + list(data.shape) + [1] * (7 - ndim)

    hdr = bytearray(_HDR_SIZE)
    struct.pack_into("<i", hdr, 0, _HDR_SIZE)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)  # bitpix
    # pixdim[0]=qfac, spacings 1.0
    struct.pack_into("<8f", hdr, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    struct.pack_into("<h", hdr, 252, 1)  # sform_code = NIFTI_XFORM_SCANNER
    struct.pack_into("<12f", hdr, 280, *np.asarray(affine[:3, :], np.float32).ravel())
    struct.pack_into("<4s", hdr, 344, b"n+1\x00")

    payload = bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F")
    if path.endswith(".gz"):
        with gzip.open(path, "wb", compresslevel=1) as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def _native():
    try:
        from unet_bssfp_tpu import native

        if native.is_available():
            return native
    except Exception:
        pass
    return None


def load_volume(path: str, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Load a NIfTI file → (data ``(D,H,W,C)``, affine ``(4,4)``). 3D volumes
    gain a singleton channel dim.

    Codec priority: native C++ (GIL-free, see ``unet_bssfp_tpu.native``) →
    nibabel → builtin pure-Python."""
    nat = _native()
    if nat is not None:
        try:
            data, affine = nat.read_volume(path)
            data = data.astype(dtype, copy=False)
            if data.ndim == 3:
                data = data[..., None]
            return data, affine
        except Exception:
            pass  # fall through to Python paths (e.g. big-endian files)
    if HAS_NIBABEL:
        img = nib.load(path)
        data = np.asarray(img.dataobj, dtype=dtype)
        affine = np.asarray(img.affine)
    else:
        data, affine = _builtin_load(path, dtype)
    if data.ndim == 3:
        data = data[..., None]
    return data, affine


def load_affine(path: str) -> np.ndarray:
    """Read only the (4,4) affine from a NIfTI header (cheap — no voxel
    decode)."""
    nat = _native()
    if nat is not None:
        try:
            import ctypes

            lib = nat._load()
            dims = (ctypes.c_int64 * 8)()
            srow = (ctypes.c_double * 12)()
            datatype = ctypes.c_int()
            rc = lib.nifti_read_header(
                path.encode(), dims, srow, ctypes.byref(datatype)
            )
            if rc == 0:
                return nat._affine_from_srow(np.asarray(srow))
        except Exception:
            pass
    if HAS_NIBABEL:
        return np.asarray(nib.load(path).affine)
    buf = _read_bytes(path)
    srow = _parse_header(buf)[6]
    affine = np.eye(4)
    if np.any(srow):
        affine[:3, :] = srow
    return affine


def save_volume(
    path: str, data: np.ndarray, affine: Optional[np.ndarray] = None
) -> None:
    """Save a ``(D,H,W,C)`` (or 3D) array; affine defaults to identity."""
    if affine is None:
        affine = np.eye(4)
    data = np.asarray(data)
    if data.ndim == 4 and data.shape[-1] == 1:
        data = data[..., 0]
    nat = _native()
    if nat is not None:
        try:
            nat.write_volume(path, data, np.asarray(affine, np.float64))
            return
        except Exception:
            pass
    if HAS_NIBABEL:
        nib.save(nib.Nifti1Image(data, affine), path)
    else:
        _builtin_save(path, data, np.asarray(affine, np.float64))
