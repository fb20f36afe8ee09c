"""Batched symmetric 3x3 eigendecomposition (vectorised cyclic Jacobi).

TPU-native replacement for the reference's per-voxel Python triple loop over
``np.linalg.eigh`` (reference ``src/eval.py:84-118`` — the hottest CPU loop in
the repo, SURVEY.md §3.3). Every voxel is an independent VPU lane of a single
vectorised jit; there is no data-dependent control flow.

Method: fixed-count cyclic Jacobi sweeps over the pairs (0,1), (0,2), (1,2).
For 3x3 symmetric matrices, 5 sweeps reach ~1e-7 relative accuracy in float32
— including repeated-eigenvalue cases where closed-form trigonometric solvers
lose half the mantissa (sqrt(ulp) ≈ 3e-4). Cost is ~45 rotations' worth of
elementwise math per voxel, negligible against HBM bandwidth for whole-volume
scalar-map evaluation.

Conventions match ``np.linalg.eigh``: eigenvalues ascending, eigenvectors as
columns (``v[..., :, k]`` pairs with ``w[..., k]``). Eigenvector *sign* is
normalised so the largest-|.|-component is positive (LAPACK's sign is
arbitrary; a deterministic convention keeps stitched-inference numerics
reproducible across backends).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_N_SWEEPS = 5


def _jacobi_rotation(app, aqq, apq):
    """Rotation (c, s, t) zeroing the (p, q) off-diagonal entry."""
    # Guard apq == 0: rotation is identity.
    safe_apq = jnp.where(apq == 0.0, 1.0, apq)
    theta = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
    # theta == 0 → sign is 0 → t must be 1 (45-degree rotation).
    t = jnp.where(theta == 0.0, 1.0, t)
    t = jnp.where(apq == 0.0, 0.0, t)
    c = 1.0 / jnp.sqrt(t * t + 1.0)
    s = t * c
    return c, s, t


def _rotate01(a, v):
    a00, a01, a02, a11, a12, a22 = a
    c, s, t = _jacobi_rotation(a00, a11, a01)
    n00 = a00 - t * a01
    n11 = a11 + t * a01
    n02 = c * a02 - s * a12
    n12 = s * a02 + c * a12
    a = (n00, jnp.zeros_like(a01), n02, n11, n12, a22)
    v = _rotate_vecs(v, 0, 1, c, s)
    return a, v


def _rotate02(a, v):
    a00, a01, a02, a11, a12, a22 = a
    c, s, t = _jacobi_rotation(a00, a22, a02)
    n00 = a00 - t * a02
    n22 = a22 + t * a02
    n01 = c * a01 - s * a12
    n12 = s * a01 + c * a12
    a = (n00, n01, jnp.zeros_like(a02), a11, n12, n22)
    v = _rotate_vecs(v, 0, 2, c, s)
    return a, v


def _rotate12(a, v):
    a00, a01, a02, a11, a12, a22 = a
    c, s, t = _jacobi_rotation(a11, a22, a12)
    n11 = a11 - t * a12
    n22 = a22 + t * a12
    n01 = c * a01 - s * a02
    n02 = s * a01 + c * a02
    a = (a00, n01, n02, n11, jnp.zeros_like(a12), n22)
    v = _rotate_vecs(v, 1, 2, c, s)
    return a, v


def _rotate_vecs(v, p, q, c, s):
    """Apply the column rotation V <- V @ G(p, q, c, s)."""
    v = list(v)
    for r in range(3):
        vp = v[3 * r + p]
        vq = v[3 * r + q]
        v[3 * r + p] = c * vp - s * vq
        v[3 * r + q] = s * vp + c * vq
    return tuple(v)


def eigh3x3_sym(
    a00: jax.Array,
    a01: jax.Array,
    a02: jax.Array,
    a11: jax.Array,
    a12: jax.Array,
    a22: jax.Array,
    unroll: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition of symmetric 3x3 matrices given as 6 component
    arrays of identical shape ``S``.

    Returns ``(w, v)`` with ``w: S + (3,)`` ascending eigenvalues and
    ``v: S + (3, 3)`` eigenvectors as columns (``v[..., :, k]``), matching
    ``np.linalg.eigh`` up to eigenvector sign.

    ``unroll=False`` runs the sweeps as a ``lax.fori_loop`` — smaller program
    (needed inside Pallas kernels, where the fully-unrolled form overwhelms
    the Mosaic compiler); ``True`` lets XLA fuse across sweeps.
    """
    dtype = jnp.result_type(a00.dtype, jnp.float32)
    a = tuple(x.astype(dtype) for x in (a00, a01, a02, a11, a12, a22))

    # Scale-normalise for float safety (overflow/underflow of squares).
    scale = jnp.maximum(
        jnp.abs(a[0]),
        jnp.maximum(
            jnp.abs(a[1]),
            jnp.maximum(
                jnp.abs(a[2]),
                jnp.maximum(
                    jnp.abs(a[3]), jnp.maximum(jnp.abs(a[4]), jnp.abs(a[5]))
                ),
            ),
        ),
    )
    inv_scale = jnp.where(scale == 0.0, 1.0, 1.0 / scale)
    a = tuple(x * inv_scale for x in a)

    one = jnp.ones_like(a[0])
    zero = jnp.zeros_like(a[0])
    v = (one, zero, zero, zero, one, zero, zero, zero, one)  # row-major I

    def sweep(carry):
        a, v = carry
        a, v = _rotate01(a, v)
        a, v = _rotate02(a, v)
        a, v = _rotate12(a, v)
        return a, v

    if unroll:
        for _ in range(_N_SWEEPS):
            a, v = sweep((a, v))
    else:
        a, v = jax.lax.fori_loop(
            0, _N_SWEEPS, lambda _, carry: sweep(carry), (a, v)
        )

    w = [a[0] * scale, a[3] * scale, a[5] * scale]
    cols = [
        (v[0], v[3], v[6]),
        (v[1], v[4], v[7]),
        (v[2], v[5], v[8]),
    ]

    # Sorting network for ascending eigenvalues (3 compare-swaps).
    def cswap(i, j):
        swap = w[i] > w[j]
        w[i], w[j] = (
            jnp.where(swap, w[j], w[i]),
            jnp.where(swap, w[i], w[j]),
        )
        ci, cj = cols[i], cols[j]
        cols[i] = tuple(jnp.where(swap, b, a_) for a_, b in zip(ci, cj))
        cols[j] = tuple(jnp.where(swap, a_, b) for a_, b in zip(ci, cj))

    cswap(0, 1)
    cswap(1, 2)
    cswap(0, 1)

    # Deterministic sign: largest-|.| component of each column positive.
    signed_cols = []
    for col in cols:
        ax, ay, az = jnp.abs(col[0]), jnp.abs(col[1]), jnp.abs(col[2])
        amax = jnp.maximum(jnp.maximum(ax, ay), az)
        lead = jnp.where(ax == amax, col[0], jnp.where(ay == amax, col[1], col[2]))
        sgn = jnp.where(lead < 0, -1.0, 1.0)
        signed_cols.append(tuple(x * sgn for x in col))

    w_out = jnp.stack(w, axis=-1)
    v_out = jnp.stack(
        [
            jnp.stack([signed_cols[k][r] for k in range(3)], axis=-1)
            for r in range(3)
        ],
        axis=-2,
    )
    return w_out, v_out


def eigh3x3_from_lower6(d6: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition from the 6-channel DT layout used throughout the
    pipeline: channels-last ``(..., 6)`` ordered (dxx, dxy, dxz, dyy, dyz,
    dzz) — FSL DTIFIT upper-triangular order (reference ``src/eval.py:87-96``).
    """
    return eigh3x3_sym(
        d6[..., 0], d6[..., 1], d6[..., 2], d6[..., 3], d6[..., 4], d6[..., 5]
    )
