"""3D PatchGAN discriminator.

Mirrors the reference discriminator (``src/model.py:68-92``): concatenate
(input, target-or-fake) on channels; per-modality first block without
BatchNorm (30→32 for the bssfp variants = 24+6 ch, 12→32 for dwi/t1w = 6+6 ch,
reference ``src/model.py:72-78``); then 32→64→128→256→512 stride-2 ConvBlocks
with BatchNorm; final 1³ conv to 1-channel patch logits. On 64³ patches the
output is a 2³ logit map.

The first block shares parameters within a modality head-group via naming
(``d1_head6``/``d1_head24``), matching the reference's shared module
instances.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_bssfp_tpu.config import HEAD_GROUPS
from unet_bssfp_tpu.models.layers import ConvBlock


class Discriminator(nn.Module):
    """``folded``: compute the k4s2 convs as shifted space-to-depth + dense
    2³ convs (``ops.folded.conv_k4s2_folded``) — same FLOPs, 8× the MXU
    reduction lanes at the small-Cin early stages. Param trees are identical
    either way (checkpoint-interchangeable)."""

    modality: str = "pc-bssfp"
    features: Tuple[int, ...] = (32, 64, 128, 256, 512)
    negative_slope: float = 0.2
    dtype: Optional[Any] = None
    folded: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, y: jax.Array, train: bool = True
    ) -> jax.Array:
        min_dim = 2 ** len(self.features)
        assert all(s >= min_dim for s in x.shape[1:4]), (
            f"patch {x.shape[1:4]} too small for {len(self.features)} "
            f"stride-2 blocks (needs >= {min_dim})"
        )
        h = jnp.concatenate([x, y], axis=-1)
        h = ConvBlock(
            self.features[0],
            batchnorm=False,
            negative_slope=self.negative_slope,
            dtype=self.dtype,
            folded=self.folded,
            name=f"d1_{HEAD_GROUPS[self.modality]}",
        )(h, train)
        for i, feat in enumerate(self.features[1:], start=2):
            h = ConvBlock(
                feat,
                negative_slope=self.negative_slope,
                dtype=self.dtype,
                folded=self.folded,
                name=f"d{i}",
            )(h, train)
        return nn.Conv(
            1, kernel_size=(1, 1, 1), dtype=self.dtype, name="final"
        )(h)
