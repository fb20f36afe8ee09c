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
