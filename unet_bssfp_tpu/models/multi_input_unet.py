"""MultiInputUNet + TrainingState — the multi-stage pretrain/transfer/finetune
regime.

The reference *evaluates* with this API (``src/eval.py:18-19`` imports
``MultiInputUNet``/``TrainingState``; ``src/eval.py:199`` calls
``model.change_training_state(state, modality)``) but the defining module was
replaced by the GAN without updating the eval flow — the published finetune
metrics come from this variant. The thesis specifies it
(``doc/thesis/03-methods.tex``, Architecture + Training):

- Backbone: BasicUNet-style with 5 encoder/decoder blocks, PReLU activations,
  feature maps 48/96/192/384/768 (decoder mirrored, final 24).
- Input heads per modality: a 3-conv ResNet block, 6-or-24 → 24 channels,
  ReLU + batch(=instance, batch-size 1) norm.
- Stages: PRETRAIN (autoencode the DT) → TRANSFER (train the new modality's
  head, backbone frozen) → FINE_TUNE (everything trainable at lr 1e-5).

JAX being functional, "change_training_state" decomposes into (a) selecting
the head module by name and (b) an optax gradient mask from
:func:`trainable_mask` — the train loop wires both.
"""

from __future__ import annotations

import enum
from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from unet_bssfp_tpu.config import HEAD_GROUPS, MODALITY_CHANNELS
from unet_bssfp_tpu.models.unet import BasicUNet3D


class TrainingState(enum.Enum):
    PRETRAIN = "pretrain"
    TRANSFER = "transfer"
    FINE_TUNE = "finetune"


class ResNetHead(nn.Module):
    """3-conv residual input head with ReLU + InstanceNorm (thesis:
    'ResNet block with 6 input channels, 24 output channels and 3
    convolutional layers with ReLU activations, and batch normalization with a
    batch size of 1, which boils down to instance normalization')."""

    features: int = 24
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        from unet_bssfp_tpu.models.layers import InstanceNorm

        h = nn.Conv(self.features, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        h = InstanceNorm(dtype=self.dtype, name="norm_in")(h)
        h = nn.relu(h)
        skip = h
        h = nn.Conv(self.features, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_mid")(h)
        h = InstanceNorm(dtype=self.dtype, name="norm_mid")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        h = InstanceNorm(dtype=self.dtype, name="norm_out")(h)
        return nn.relu(h + skip)


class PReLUUNet(BasicUNet3D):
    """BasicUNet3D variant with the thesis feature widths and learnable
    per-channel PReLU activations (slopes initialised at torch's PReLU
    default 0.25; thesis 03-methods.tex Architecture)."""

    features: Tuple[int, ...] = (48, 96, 192, 384, 768, 24)
    negative_slope: float = 0.25
    prelu: bool = True


class MultiInputUNet(nn.Module):
    modality: str = "dwi-tensor"
    out_channels: int = 6
    features: Tuple[int, ...] = (48, 96, 192, 384, 768, 24)
    dropout: float = 0.05
    dtype: Optional[Any] = None
    use_fused: bool = False
    # Pallas spatial-lane conv kernel for the full-res stages — see
    # models.unet (the packed path supports the learnable PReLU slopes).
    packed: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        assert x.shape[-1] == MODALITY_CHANNELS[self.modality]
        h = ResNetHead(24, dtype=self.dtype,
                       name=f"head_{HEAD_GROUPS[self.modality]}")(x, train)
        return PReLUUNet(
            out_channels=self.out_channels,
            features=self.features,
            dropout=self.dropout,
            dtype=self.dtype,
            use_fused=self.use_fused,
            packed=self.packed,
            name="unet",
        )(h, train)


def trainable_mask(params, state: TrainingState):
    """Boolean pytree mask for optax: which parameters receive updates.

    PRETRAIN / FINE_TUNE: everything. TRANSFER: only the input head (thesis:
    'training the ResNet input block, while the rest of the parameters in the
    NN remain frozen').
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    if state == TrainingState.TRANSFER:
        mask = {k: k[0].startswith("head") for k in flat}
    else:
        mask = {k: True for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def stage_lr(state: TrainingState, base_lr: float, finetune_lr: float) -> float:
    """Learning rate per stage (thesis: finetune at 1e-5)."""
    return finetune_lr if state == TrainingState.FINE_TUNE else base_lr
