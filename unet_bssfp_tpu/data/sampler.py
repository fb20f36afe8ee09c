"""Patch sampling and grid-stitched aggregation (pure JAX).

Replaces TorchIO's ``UniformSampler``/``Queue`` training path
(``src/data_module.py:152-166``) and ``GridSampler``/``GridAggregator``
inference path (``src/data_module.py:168-183``, ``src/model.py:291-313``)
with jit-friendly static-shape ops: random corners + ``dynamic_slice`` for
training patches; a static location grid + a scanned scatter-add with
count-normalisation for stitching (deterministic overlap averaging — the
'stitched inference numerics' hard part in SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def uniform_patch_starts(
    key: jax.Array,
    volume_shape: Tuple[int, int, int],
    patch_size: int,
    num_patches: int,
) -> jax.Array:
    """``(num_patches, 3)`` random patch corners, uniform over valid starts
    (TorchIO ``UniformSampler(patch_sz)`` semantics)."""
    maxs = jnp.array(
        [volume_shape[i] - patch_size + 1 for i in range(3)], jnp.int32
    )
    u = jax.random.uniform(key, (num_patches, 3))
    return jnp.floor(u * maxs).astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,))
def extract_patches(
    volume: jax.Array, starts: jax.Array, patch_size: int
) -> jax.Array:
    """Gather ``(P, p, p, p, C)`` patches from a ``(D, H, W, C)`` volume at
    ``starts (P, 3)`` via vmapped dynamic_slice (static shapes → one compile).
    """

    def one(start):
        return jax.lax.dynamic_slice(
            volume,
            (start[0], start[1], start[2], 0),
            (patch_size, patch_size, patch_size, volume.shape[-1]),
        )

    return jax.vmap(one)(starts)


def grid_patch_starts(
    volume_shape: Sequence[int], patch_size: int
) -> np.ndarray:
    """Static grid of patch corners covering the volume (TorchIO
    ``GridSampler`` with patch_overlap=0): stride = patch size, with the final
    patch shifted flush to the boundary when the dim isn't divisible.

    For (96,128,128)/64 this yields 2x2x2 = 8 locations with a 32-voxel
    overlap along the first axis.
    """
    axes = []
    for dim in volume_shape[:3]:
        if dim < patch_size:
            raise ValueError(
                f"volume dim {dim} smaller than patch size {patch_size}; "
                f"crop_or_pad the volume up or reduce the patch size"
            )
        starts = list(range(0, dim - patch_size + 1, patch_size))
        last = dim - patch_size
        if starts[-1] != last:
            starts.append(last)
        axes.append(starts)
    grid = [(z, y, x) for z in axes[0] for y in axes[1] for x in axes[2]]
    return np.asarray(grid, np.int32)


class GridAggregator:
    """Stitch patch predictions back into a volume.

    ``mode='average'`` (default): deterministic overlap averaging via
    scatter-add + count normalisation — on-device, reproducible across
    backends. ``mode='overwrite'`` reproduces TorchIO's crop-mode behaviour
    with patch_overlap=0, where later patches overwrite earlier ones in the
    shifted-remainder overlap region.
    """

    def __init__(
        self,
        volume_shape: Tuple[int, int, int],
        channels: int,
        patch_size: int,
        mode: str = "average",
    ):
        if mode not in ("average", "overwrite"):
            raise ValueError(f"unknown aggregation mode {mode!r}")
        self.volume_shape = tuple(volume_shape)
        self.channels = channels
        self.patch_size = patch_size
        self.mode = mode
        self._starts = jnp.asarray(
            grid_patch_starts(volume_shape, patch_size)
        )
        self._stitch = jax.jit(self._stitch_impl)

    def _stitch_impl(self, patches: jax.Array) -> jax.Array:
        shape = self.volume_shape + (self.channels,)
        p = self.patch_size

        def body(carry, inp):
            acc, cnt = carry
            start, patch = inp
            idx = (start[0], start[1], start[2], 0)
            cur = jax.lax.dynamic_slice(acc, idx, patch.shape)
            ones = jnp.ones(patch.shape[:3] + (1,), acc.dtype)
            if self.mode == "average":
                acc = jax.lax.dynamic_update_slice(acc, cur + patch, idx)
                cur_c = jax.lax.dynamic_slice(
                    cnt, idx, patch.shape[:3] + (1,)
                )
                cnt = jax.lax.dynamic_update_slice(cnt, cur_c + ones, idx)
            else:
                acc = jax.lax.dynamic_update_slice(acc, patch, idx)
            return (acc, cnt), None

        acc = jnp.zeros(shape, patches.dtype)
        cnt = jnp.zeros(self.volume_shape + (1,), patches.dtype)
        (acc, cnt), _ = jax.lax.scan(body, (acc, cnt), (self._starts, patches))
        if self.mode == "average":
            acc = acc / jnp.maximum(cnt, 1.0)
        return acc

    @property
    def starts(self) -> jax.Array:
        return self._starts

    def stitch(self, patches: jax.Array) -> jax.Array:
        """``(P, p, p, p, C)`` patches (ordered like ``starts``) → stitched
        ``(D, H, W, C)`` volume."""
        assert patches.shape[0] == self._starts.shape[0]
        return self._stitch(patches)
