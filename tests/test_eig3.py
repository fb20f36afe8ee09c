"""eig3 closed-form eigensolver vs np.linalg.eigh (SURVEY.md §4a)."""

import numpy as np
import jax.numpy as jnp

from unet_bssfp_tpu.ops.eig3 import eigh3x3_from_lower6, eigh3x3_sym


def _random_d6(rng, n, scale=1.0):
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def _to_mats(d6):
    dxx, dxy, dxz, dyy, dyz, dzz = [d6[..., i] for i in range(6)]
    m = np.stack(
        [
            np.stack([dxx, dxy, dxz], -1),
            np.stack([dxy, dyy, dyz], -1),
            np.stack([dxz, dyz, dzz], -1),
        ],
        -2,
    )
    return m


def test_eigenvalues_match_lapack(rng):
    d6 = _random_d6(rng, 2048)
    w, _ = eigh3x3_from_lower6(jnp.asarray(d6))
    w_ref = np.linalg.eigh(_to_mats(d6))[0]
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=2e-4, atol=2e-5)


def test_eigenvalues_dt_scale(rng):
    # Realistic DT magnitudes ~1e-3 (rescale_args_dwi.txt range).
    d6 = _random_d6(rng, 2048, scale=1e-3)
    w, _ = eigh3x3_from_lower6(jnp.asarray(d6))
    w_ref = np.linalg.eigh(_to_mats(d6))[0]
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=2e-4, atol=2e-8)


def test_eigenvectors_satisfy_definition(rng):
    d6 = _random_d6(rng, 512)
    w, v = eigh3x3_from_lower6(jnp.asarray(d6))
    w, v = np.asarray(w), np.asarray(v)
    mats = _to_mats(d6)
    for k in range(3):
        av = np.einsum("nij,nj->ni", mats, v[:, :, k])
        lv = w[:, k : k + 1] * v[:, :, k]
        np.testing.assert_allclose(av, lv, atol=5e-4)
    # Orthonormal columns.
    vtv = np.einsum("nij,nik->njk", v, v)
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=1e-4)


def test_eigenvectors_match_lapack_up_to_sign(rng):
    d6 = _random_d6(rng, 512)
    _, v = eigh3x3_from_lower6(jnp.asarray(d6))
    v = np.asarray(v)
    v_ref = np.linalg.eigh(_to_mats(d6))[1]
    # |v . v_ref| == 1 per column (sign convention may differ).
    dots = np.abs(np.einsum("nik,nik->nk", v, v_ref))
    np.testing.assert_allclose(dots, 1.0, atol=5e-4)


def test_isotropic_and_degenerate():
    # Isotropic: A = c*I.
    d6 = np.array([[2.0, 0, 0, 2.0, 0, 2.0]], np.float32)
    w, v = eigh3x3_from_lower6(jnp.asarray(d6))
    np.testing.assert_allclose(np.asarray(w)[0], [2.0, 2.0, 2.0], atol=1e-6)
    vtv = np.asarray(v)[0].T @ np.asarray(v)[0]
    np.testing.assert_allclose(vtv, np.eye(3), atol=1e-5)

    # Doubly-degenerate: diag(1, 1, 3).
    d6 = np.array([[1.0, 0, 0, 1.0, 0, 3.0]], np.float32)
    w, v = eigh3x3_from_lower6(jnp.asarray(d6))
    np.testing.assert_allclose(np.asarray(w)[0], [1.0, 1.0, 3.0], atol=1e-6)
    vtv = np.asarray(v)[0].T @ np.asarray(v)[0]
    np.testing.assert_allclose(vtv, np.eye(3), atol=1e-5)

    # Zero matrix.
    d6 = np.zeros((1, 6), np.float32)
    w, v = eigh3x3_from_lower6(jnp.asarray(d6))
    assert np.all(np.isfinite(np.asarray(w)))
    assert np.all(np.isfinite(np.asarray(v)))


def test_volume_shaped_input(rng):
    d6 = rng.standard_normal((4, 5, 6, 6)).astype(np.float32)
    w, v = eigh3x3_from_lower6(jnp.asarray(d6))
    assert w.shape == (4, 5, 6, 3)
    assert v.shape == (4, 5, 6, 3, 3)


def test_component_api(rng):
    d6 = _random_d6(rng, 16)
    w1, _ = eigh3x3_from_lower6(jnp.asarray(d6))
    w2, _ = eigh3x3_sym(*[jnp.asarray(d6[:, i]) for i in range(6)])
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))
