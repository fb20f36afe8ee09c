"""Diffusion-tensor scalar maps, fully vectorised on device.

Replaces the reference's pure-Python per-voxel loop (``src/eval.py:73-135``)
with one jitted computation over the whole volume: assemble the symmetric 3x3
per voxel from the 6 channels, closed-form eigendecomposition, then
AD/RD/MD/FA/azimuth/inclination/direction-encoded-RGB exactly as defined at
``src/eval.py:99-118``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_bssfp_tpu.ops.eig3 import eigh3x3_from_lower6


class ScalarMaps(NamedTuple):
    """Per-voxel DT-derived scalars. Spatial shape ``S``; rgb is ``S+(3,)``."""

    fa: jax.Array
    md: jax.Array
    ad: jax.Array
    rd: jax.Array
    azimuth: jax.Array
    inclination: jax.Array
    rgb: jax.Array


@jax.jit
def compute_scalar_maps(d6: jax.Array) -> ScalarMaps:
    """Compute all DT scalar maps from a channels-last ``(..., 6)`` tensor
    volume ordered (dxx, dxy, dxz, dyy, dyz, dzz).

    Definitions (reference ``src/eval.py:99-118``):
      AD = lambda_2 (largest), RD = (lambda_0 + lambda_1)/2, MD = mean(lambda),
      FA = sqrt(1.5) * ||lambda - MD|| / ||lambda||,
      azimuth = atan2(v2_y, v2_x) in degrees,
      inclination = acos(v2_z / ||v2||) in degrees,
      RGB = FA * |v2|   (principal eigenvector v2).

    Note: eigenvector sign is normalised deterministically (see
    ``ops.eig3``); LAPACK's sign is arbitrary, so azimuth/inclination match the
    reference up to the antipodal v <-> -v equivalence. FA/MD/AD/RD and RGB are
    sign-invariant.
    """
    w, v = eigh3x3_from_lower6(d6)
    lam0, lam1, lam2 = w[..., 0], w[..., 1], w[..., 2]

    ad = lam2
    rd = (lam0 + lam1) / 2.0
    md = (lam0 + lam1 + lam2) / 3.0

    var = jnp.sqrt(
        (lam0 - md) ** 2 + (lam1 - md) ** 2 + (lam2 - md) ** 2
    )
    norm = jnp.sqrt(lam0 * lam0 + lam1 * lam1 + lam2 * lam2)
    fa = jnp.sqrt(1.5) * var / jnp.where(norm == 0, 1.0, norm)

    v2 = v[..., :, 2]
    rad2deg = 180.0 / jnp.pi
    azimuth = rad2deg * jnp.arctan2(v2[..., 1], v2[..., 0])
    r = jnp.sqrt(jnp.sum(v2 * v2, axis=-1))
    inclination = rad2deg * jnp.arccos(
        jnp.clip(v2[..., 2] / jnp.where(r == 0, 1.0, r), -1.0, 1.0)
    )
    rgb = fa[..., None] * jnp.abs(v2)

    return ScalarMaps(fa, md, ad, rd, azimuth, inclination, rgb)


def load_rescale_args(path: str) -> np.ndarray:
    """Parse a ``rescale_args_*.txt`` constants file into an ``(C, 2)`` array
    of per-channel (min, max).

    Handles both layouts the reference ships: one (min, max) pair per row
    (``rescale_args_dwi.txt`` — 6 rows x 2 cols) and alternating min/max lines
    (``rescale_args_bssfp.txt``/``_t1w.txt`` — 2k rows x 1 col). This fixes the
    reference's broken 6-row unpack (``src/eval.py:51-52`` unpacks only 2 rows
    and was therefore disabled at ``src/eval.py:321``).
    """
    mat = np.loadtxt(path)
    if mat.ndim == 1:
        if mat.size % 2 != 0:
            raise ValueError(f"odd number of rescale constants in {path}")
        mat = mat.reshape(-1, 2)
    if mat.shape[-1] != 2:
        raise ValueError(f"expected (C,2) rescale constants, got {mat.shape}")
    return mat


def invert_dwi_tensor_norm(data: jax.Array, minmax: np.ndarray) -> jax.Array:
    """Invert the dataset-wide per-channel min/max rescale:
    ``x * |max - min| + min`` (reference ``src/eval.py:39-47``; thesis
    03-methods.tex: de-normalisation before scalar-map computation).

    ``data`` is channels-last ``(..., C)``; ``minmax`` is ``(C, 2)`` or
    ``(1, 2)`` (broadcast across channels).
    """
    minmax = np.asarray(minmax, dtype=np.float32)
    min_v = jnp.asarray(minmax[:, 0])
    max_v = jnp.asarray(minmax[:, 1])
    return data * jnp.abs(max_v - min_v) + min_v
