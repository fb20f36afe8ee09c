"""Native C++ NIfTI codec: build, roundtrip, cross-codec compatibility."""

import numpy as np
import pytest

from unet_bssfp_tpu import native
from unet_bssfp_tpu.data.nifti import _builtin_load, _builtin_save


pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no C++ toolchain"
)


def test_native_roundtrip(tmp_path, rng):
    x = rng.random((6, 7, 8, 3)).astype(np.float32)
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    aff[:3, 3] = [1, 2, 3]
    p = str(tmp_path / "t.nii.gz")
    native.write_volume(p, x, aff)
    y, a2 = native.read_volume(p)
    np.testing.assert_array_equal(x, y)
    np.testing.assert_allclose(aff, a2, atol=1e-6)


def test_native_uncompressed(tmp_path, rng):
    x = rng.random((5, 5, 5)).astype(np.float32)
    p = str(tmp_path / "t.nii")
    native.write_volume(p, x, np.eye(4))
    y, _ = native.read_volume(p)
    np.testing.assert_array_equal(x, y)


def test_native_reads_python_written(tmp_path, rng):
    x = rng.random((4, 6, 5, 2)).astype(np.float32)
    p = str(tmp_path / "py.nii.gz")
    _builtin_save(p, x, np.eye(4))
    y, _ = native.read_volume(p)
    np.testing.assert_array_equal(x, y)


def test_python_reads_native_written(tmp_path, rng):
    x = rng.random((4, 6, 5, 2)).astype(np.float32)
    p = str(tmp_path / "nat.nii.gz")
    native.write_volume(p, x, np.eye(4))
    y, _ = _builtin_load(p)
    np.testing.assert_array_equal(x, y)


def test_native_missing_file():
    with pytest.raises(IOError):
        native.read_volume("/nonexistent/file.nii.gz")


def test_load_affine_header_only(tmp_path, rng):
    from unet_bssfp_tpu.data.nifti import load_affine, save_volume

    aff = np.diag([2.0, 2.0, 2.5, 1.0])
    aff[:3, 3] = [-10, 5, 7]
    p = str(tmp_path / "aff.nii.gz")
    save_volume(p, rng.random((4, 4, 4, 2)).astype(np.float32), aff)
    out = load_affine(p)
    np.testing.assert_allclose(out, aff, atol=1e-6)


def test_builtin_scl_inter_applied(tmp_path):
    """NIfTI-1 scaling with slope=1, nonzero intercept must be applied."""
    import gzip
    import struct

    from unet_bssfp_tpu.data.nifti import _builtin_load, _builtin_save

    x = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    p = str(tmp_path / "inter.nii")
    _builtin_save(p, x, np.eye(4))
    # Patch scl_inter (offset 116) to -1024 in the written header.
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 116, -1024.0)
    open(p, "wb").write(bytes(raw))
    data, _ = _builtin_load(p)
    np.testing.assert_allclose(data, x - 1024.0)
