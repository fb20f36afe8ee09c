"""Deterministic preprocessing transforms (pure JAX, jit-friendly).

Replaces the reference's in-pipeline TorchIO preprocessing — which is just
``tio.CropOrPad((96,128,128), 0)`` (``src/data_module.py:125-128``) — plus the
offline rescale/Z-norm steps documented in the thesis preprocessing chain
(BASELINE.json north star: Resample/RescaleIntensity/ZNormalization/CropOrPad
as a fused JAX pipeline).

Volumes are channels-last ``(D, H, W, C)``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1,))
def crop_or_pad(
    volume: jax.Array, target: Tuple[int, int, int], fill: float = 0.0
) -> jax.Array:
    """Centre crop-or-pad to ``target`` spatial shape with constant fill
    (TorchIO ``CropOrPad`` semantics: symmetric, extra voxel on the trailing
    side; reference ``src/data_module.py:127`` uses (96,128,128), fill 0).
    """
    out = volume
    for ax in range(3):
        cur = out.shape[ax]
        tgt = target[ax]
        if cur > tgt:
            start = (cur - tgt) // 2
            out = jax.lax.slice_in_dim(out, start, start + tgt, axis=ax)
        elif cur < tgt:
            before = (tgt - cur) // 2
            after = tgt - cur - before
            pads = [(0, 0)] * out.ndim
            pads[ax] = (before, after)
            out = jnp.pad(out, pads, constant_values=fill)
    return out


def rescale_intensity(
    volume: jax.Array, in_min: jax.Array, in_max: jax.Array
) -> jax.Array:
    """Min/max rescale to [0, 1] given dataset-wide per-channel bounds (the
    offline normalisation the ``rescale_args_*.txt`` constants encode;
    inverted at eval time by ``ops.scalar_maps.invert_dwi_tensor_norm``)."""
    scale = jnp.where(in_max == in_min, 1.0, in_max - in_min)
    return (volume - in_min) / scale


def znormalize(volume: jax.Array) -> jax.Array:
    """Whole-volume Z-normalisation (TorchIO ``ZNormalization``)."""
    from unet_bssfp_tpu.ops.metrics import znorm

    return znorm(volume)


@partial(jax.jit, static_argnums=(1,))
def resample_trilinear(
    volume: jax.Array, target: Tuple[int, int, int]
) -> jax.Array:
    """Trilinear resample of a ``(D, H, W, C)`` volume to a target spatial
    shape (the offline 'Resample to a common grid' step; implemented on-device
    so preprocessing can fuse)."""
    return jax.image.resize(
        volume, target + (volume.shape[-1],), method="trilinear"
    )
