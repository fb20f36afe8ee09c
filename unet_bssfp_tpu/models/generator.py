"""Generator: per-modality 1³-conv input head → BasicUNet3D backbone.

Mirrors the reference generator (``src/model.py:15-39``): the head maps
modality channels → 24 (ConvBlock k=1/s=1/p=0 with BatchNorm + LeakyReLU(0.2)),
the backbone maps 24 → 6 DT channels.

Head sharing (reference ``src/model.py:29-34``: ``dwi-tensor``/``t1w`` share a
6→24 head module instance; ``pc-bssfp``/``bssfp`` share a 24→24 head) is
realised by *naming* the head after its group (``head6``/``head24``,
``config.HEAD_GROUPS``): checkpoints trained on one modality restore onto the
other member of the group with identical parameters, and — unlike the
reference, which must carry every head and needs DDP
``find_unused_parameters`` (``src/train.py:30``) — only the active head's
parameters exist in the pytree at all.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from unet_bssfp_tpu.config import HEAD_GROUPS, MODALITY_CHANNELS
from unet_bssfp_tpu.models.layers import ConvBlock
from unet_bssfp_tpu.models.unet import BasicUNet3D


class Generator(nn.Module):
    modality: str = "pc-bssfp"
    unet_in_channels: int = 24
    out_channels: int = 6
    features: Tuple[int, ...] = (32, 64, 128, 256, 512, 32)
    dropout: float = 0.05
    unet_negative_slope: float = 0.1
    head_negative_slope: float = 0.2
    dtype: Optional[Any] = None
    remat: bool = False
    use_fused: bool = True
    # Folded (shifted space-to-depth) full-res stages — see models.unet.
    folded: bool = False
    # Pallas spatial-lane conv kernel for the full-res stages — see
    # models.unet (takes precedence over ``folded``).
    packed: bool = False
    # w-packed conv GEMMs for the mid-res stages — see models.unet.
    wpack_mid: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        assert x.shape[-1] == MODALITY_CHANNELS[self.modality], (
            f"{self.modality} expects {MODALITY_CHANNELS[self.modality]} "
            f"channels, got {x.shape[-1]}"
        )
        x = ConvBlock(
            self.unet_in_channels,
            kernel=1,
            stride=1,
            padding=0,
            negative_slope=self.head_negative_slope,
            dtype=self.dtype,
            name=HEAD_GROUPS[self.modality],
        )(x, train)
        return BasicUNet3D(
            out_channels=self.out_channels,
            features=self.features,
            dropout=self.dropout,
            negative_slope=self.unet_negative_slope,
            dtype=self.dtype,
            remat=self.remat,
            use_fused=self.use_fused,
            folded=self.folded,
            packed=self.packed,
            wpack_mid=self.wpack_mid,
            name="unet",
        )(x, train)
