"""Scalar maps vs a NumPy re-derivation of the reference voxel loop
(reference src/eval.py:84-118)."""

import numpy as np
import jax.numpy as jnp

from unet_bssfp_tpu.ops.scalar_maps import (
    compute_scalar_maps,
    invert_dwi_tensor_norm,
    load_rescale_args,
)


def _reference_voxel_maps(data):
    """NumPy port of the reference per-voxel loop for fixture generation."""
    shape = data.shape[:-1]
    fa = np.zeros(shape)
    md = np.zeros(shape)
    ad = np.zeros(shape)
    rd = np.zeros(shape)
    rgb = np.zeros(shape + (3,))
    for idx in np.ndindex(shape):
        dxx, dxy, dxz, dyy, dyz, dzz = data[idx]
        d = np.array([[dxx, dxy, dxz], [dxy, dyy, dyz], [dxz, dyz, dzz]])
        eigvals, eigvecs = np.linalg.eigh(d)
        ad[idx] = eigvals[2]
        rd[idx] = (eigvals[0] + eigvals[1]) / 2
        md[idx] = np.mean(eigvals)
        var = np.sqrt(((eigvals - md[idx]) ** 2).sum())
        norm = np.sqrt((eigvals**2).sum())
        fa[idx] = np.sqrt(1.5) * var / norm
        rgb[idx] = fa[idx] * np.abs(eigvecs[:, 2])
    return fa, md, ad, rd, rgb


def test_scalar_maps_match_reference_math(rng):
    data = rng.standard_normal((4, 4, 4, 6)).astype(np.float32) * 1e-3
    maps = compute_scalar_maps(jnp.asarray(data))
    fa, md, ad, rd, rgb = _reference_voxel_maps(data.astype(np.float64))
    np.testing.assert_allclose(np.asarray(maps.fa), fa, atol=1e-4)
    np.testing.assert_allclose(np.asarray(maps.md), md, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(maps.ad), ad, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(maps.rd), rd, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(maps.rgb), rgb, atol=1e-3)


def test_angles_antipodal_equivalent(rng):
    data = rng.standard_normal((64, 6)).astype(np.float32)
    maps = compute_scalar_maps(jnp.asarray(data))
    az = np.asarray(maps.azimuth)
    inc = np.asarray(maps.inclination)
    assert np.all((az >= -180) & (az <= 180))
    assert np.all((inc >= 0) & (inc <= 180))
    # Cross-check against LAPACK principal eigenvector up to v <-> -v.
    for i in range(8):
        dxx, dxy, dxz, dyy, dyz, dzz = data[i]
        d = np.array([[dxx, dxy, dxz], [dxy, dyy, dyz], [dxz, dyz, dzz]])
        v2 = np.linalg.eigh(d)[1][:, 2]
        az_ref = 180 / np.pi * np.arctan2(v2[1], v2[0])
        inc_ref = 180 / np.pi * np.arccos(v2[2] / np.linalg.norm(v2))
        az_flip = 180 / np.pi * np.arctan2(-v2[1], -v2[0])
        inc_flip = 180 / np.pi * np.arccos(-v2[2] / np.linalg.norm(v2))
        ok_direct = np.isclose(az[i], az_ref, atol=0.1) and np.isclose(
            inc[i], inc_ref, atol=0.1
        )
        ok_flip = np.isclose(az[i], az_flip, atol=0.1) and np.isclose(
            inc[i], inc_flip, atol=0.1
        )
        assert ok_direct or ok_flip


def test_invert_dwi_tensor_norm(tmp_path):
    # 6-row (min, max) file like rescale_args_dwi.txt — the case the
    # reference's 2-row unpack could not handle (src/eval.py:51-52).
    mat = np.array(
        [
            [-2.0e-3, 3.6e-3],
            [-8.2e-4, 8.0e-4],
            [-8.1e-4, 7.9e-4],
            [-2.0e-3, 3.7e-3],
            [-8.3e-4, 1.0e-3],
            [-2.1e-3, 3.6e-3],
        ]
    )
    f = tmp_path / "rescale_args_dwi.txt"
    np.savetxt(f, mat)
    parsed = load_rescale_args(str(f))
    np.testing.assert_allclose(parsed, mat, rtol=1e-6)

    x = np.random.default_rng(0).random((3, 3, 3, 6)).astype(np.float32)
    y = np.asarray(invert_dwi_tensor_norm(jnp.asarray(x), parsed))
    expect = x * np.abs(mat[:, 1] - mat[:, 0]) + mat[:, 0]
    np.testing.assert_allclose(y, expect.astype(np.float32), rtol=1e-5)


def test_load_rescale_args_flat_layout(tmp_path):
    # Alternating min/max single-column file like rescale_args_bssfp.txt.
    vals = np.array([0.0, 2267.16, -np.pi, np.pi])
    f = tmp_path / "rescale_args_bssfp.txt"
    np.savetxt(f, vals)
    parsed = load_rescale_args(str(f))
    assert parsed.shape == (2, 2)
    np.testing.assert_allclose(parsed[0], [0.0, 2267.16], rtol=1e-5)
