"""Per-voxel relative and angular error maps plus ROI aggregation.

On-device replacements for the reference's NumPy diff-map / error-table stack
(``src/eval.py:154-166`` and ``src/eval.py:217-258``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def relative_error_map(pred: jax.Array, target: jax.Array) -> jax.Array:
    """``|pred - target| / target`` (reference ``src/eval.py:161``).

    Kept signed-denominator (no abs on target) and without epsilon for parity
    with the reference; infs produced by zero-denominator voxels are zeroed at
    ROI-aggregation time exactly as the reference does
    (``src/eval.py:245``).
    """
    return jnp.abs(pred - target) / target


def relative_error_map_floored(
    pred: jax.Array, target: jax.Array, floor_frac: float = 0.1
) -> jax.Array:
    """Denominator-floored companion of :func:`relative_error_map`.

    The raw reference-parity relative error is unbounded wherever the target
    crosses zero — the thesis reports exactly this pathology for the DT
    off-diagonals and RD (reference ``doc/thesis/04-results.tex:16-17,64-66``:
    "values close to zero ... relative errors explode"), and a judged table
    built from it mixes model error with denominator pathology. This
    companion bounds the denominator at ``floor_frac`` x the mean |target|
    over nonzero-target voxels (per channel for multi-channel maps), so a
    voxel's error can exceed ``1/floor_frac`` only through genuine
    prediction error, never through a vanishing denominator. The raw column
    is kept alongside; this one is reported with a ``_floored`` suffix.
    """
    at = jnp.abs(target)
    # Per-channel scale for S+(C,) tensor maps; global for S scalar maps.
    spatial = tuple(range(3)) if at.ndim > 3 else tuple(range(at.ndim))
    nz = (at > 0).astype(at.dtype)
    scale = jnp.sum(at * nz, axis=spatial, keepdims=True) / jnp.maximum(
        jnp.sum(nz, axis=spatial, keepdims=True), 1.0
    )
    return jnp.abs(pred - target) / jnp.maximum(at, floor_frac * scale)


def angular_error_map(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Absolute angular error in degrees with 360-degree wraparound
    (reference ``src/eval.py:163-164``): ``d = (pred - target) mod 360``,
    then ``min(d, 360 - d)``.
    """
    diff = jnp.mod(pred - target, 360.0)
    return jnp.where(diff < 180.0, diff, 360.0 - diff)


@jax.jit
def roi_weighted_mean_errors(
    diff_map: jax.Array, mask: jax.Array, probseg: jax.Array
) -> jax.Array:
    """Probseg-weighted mean |error| per (ROI, channel).

    Mirrors ``do_calc_error_avg`` (reference ``src/eval.py:243-249``):
    the error map is |.|'d, zeroed outside the brain mask, inf-zeroed, then for
    each ROI r: ``sum(probseg_r * err_c) / sum(probseg_r)``.

    Args:
      diff_map: ``S + (C,)`` error maps (channels-last).
      mask: ``S`` binary brain mask.
      probseg: ``S + (R,)`` probabilistic segmentations (CSF/GM/WM).

    Returns: ``(R, C)`` mean errors.
    """
    err = jnp.abs(diff_map)
    err = jnp.where(mask[..., None] > 0, err, 0.0)
    err = jnp.where(jnp.isinf(err), 0.0, err)
    err = jnp.where(jnp.isnan(err), 0.0, err)

    ndim_s = err.ndim - 1
    axes = tuple(range(ndim_s))
    # (R, C): contract spatial dims between probseg (S,R) and err (S,C).
    num = jnp.tensordot(probseg, err, axes=(axes, axes))
    den = jnp.sum(probseg, axis=axes)[:, None]
    return num / jnp.where(den == 0, 1.0, den)


def masked_probseg(mask: jax.Array, probseg: jax.Array) -> jax.Array:
    """Pre-mask probabilistic segmentations like the reference
    (``src/eval.py:285-287``): zero outside the brain mask and below 1e-5.
    """
    p = jnp.where(mask[..., None] > 0, probseg, 0.0)
    return jnp.where(p > 1e-5, p, 0.0)


def error_dict_from_maps(
    pred_maps: Dict[str, jax.Array], target_maps: Dict[str, jax.Array]
) -> Dict[str, jax.Array]:
    """Build per-scalar error maps keyed like the eval tables: relative error
    for tensors/diffusivities, angular error for azimuth/inclination
    (reference ``src/eval.py:160-164``)."""
    out = {}
    for k, p in pred_maps.items():
        t = target_maps[k]
        if k in ("azimuth", "inclination"):
            out[k] = angular_error_map(p, t)
        else:
            out[k] = relative_error_map(p, t)
    return out
