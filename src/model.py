"""Public model surface mirroring the reference's ``src/model.py``.

Exposes the same names — ``Generator``, ``Discriminator``, ``DownSampleConv``,
``PerceptualL1Loss``, ``bSSFPToDWITensorModel``, ``check_input_shape`` — built
on the TPU-native stack. ``bSSFPToDWITensorModel`` bundles the networks,
losses, optimizers and step functions the reference LightningModule carried
(``src/model.py:141-361``) as a functional-state wrapper.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_bssfp_tpu.config import Config, MODALITY_CHANNELS
from unet_bssfp_tpu.models import Discriminator, Generator  # noqa: F401
from unet_bssfp_tpu.models.layers import ConvBlock as DownSampleConv  # noqa: F401
from unet_bssfp_tpu.models import MultiInputUNet, TrainingState  # noqa: F401
from unet_bssfp_tpu.models.medicalnet import (
    MedicalNetResNet10,
    init_medicalnet,
    perceptual_distance,
)
from unet_bssfp_tpu.ops.losses import l1_loss
from unet_bssfp_tpu.train.checkpoint import load_checkpoint
from unet_bssfp_tpu.train.state import GANTrainState, build_models, create_gan_state
from unet_bssfp_tpu.train.steps import make_eval_step, make_predict_fn, make_train_step


class PerceptualL1Loss:
    """L1 + scaled MedicalNet perceptual distance, returned as a dict
    (reference ``PerceptualL1Loss``, ``src/model.py:123-138``).

    Without converted Med3D weights the feature extractor is a fixed random
    deep network (see ``models.medicalnet``); pass ``variables`` from
    ``load_torch_state_dict`` for parity with the pretrained reference.
    """

    def __init__(self, perceptual_factor: float = 1e3, variables=None,
                 seed: int = 0, weights_path: Optional[str] = None):
        from unet_bssfp_tpu.models.medicalnet import load_medicalnet

        self.perceptual_factor = perceptual_factor
        if variables is None:
            self.net, self.variables = load_medicalnet(weights_path, seed)
        else:
            self.net = MedicalNetResNet10()
            self.variables = variables

    def get_perceptual_model(self):
        return self.net, self.variables

    def perceptual_fn(self, y_hat: jax.Array, y: jax.Array) -> jax.Array:
        return perceptual_distance(self.net, self.variables, y_hat, y)

    def __call__(self, y_hat: jax.Array, y: jax.Array) -> Dict[str, jax.Array]:
        return {
            "L1": l1_loss(y_hat, y),
            "Perceptual": self.perceptual_fn(y_hat, y)
            * self.perceptual_factor,
        }


class bSSFPToDWITensorModel:
    """Functional-state counterpart of the reference LightningModule
    (``src/model.py:141-165``): same hyperparameters (lr 1e-3, batch 8,
    perceptual_factor 1e3, recon_factor 1e2), two AdamW optimizers, GAN step
    semantics via ``unet_bssfp_tpu.train.steps``."""

    def __init__(
        self,
        input_modality: str,
        lr: float = 1e-3,
        batch_size: int = 8,
        perceptual_factor: float = 1e3,
        recon_factor: float = 1e2,
        config: Optional[Config] = None,
        # The reference always constructs PerceptualL1Loss with PRETRAINED
        # features (src/model.py:146). None = auto: perceptual-on iff
        # converted Med3D weights resolve; without them the random-feature
        # term at 1e3 weighting is measured to hurt voxel fidelity
        # (train/loop.py::resolve_with_perceptual), so auto falls back to
        # L1+BCE. True forces it on regardless.
        with_perceptual: Optional[bool] = None,
        mesh=None,
    ):
        import dataclasses

        from unet_bssfp_tpu.train.loop import resolve_with_perceptual

        config = config or Config()
        tcfg = dataclasses.replace(
            config.train,
            lr=lr,
            perceptual_factor=perceptual_factor,
            recon_factor=recon_factor,
            with_perceptual=with_perceptual,
        )
        with_perceptual = resolve_with_perceptual(tcfg)
        self.config = dataclasses.replace(config, train=tcfg)
        self.input_modality = input_modality
        self.batch_size = batch_size
        self.gen, self.discr = build_models(input_modality, config.model)
        self.recon_criterion = (
            PerceptualL1Loss(
                perceptual_factor,
                weights_path=config.train.medicalnet_weights,
            )
            if with_perceptual
            else None
        )
        perceptual_fn = (
            self.recon_criterion.perceptual_fn if with_perceptual else None
        )
        self.train_step = make_train_step(
            self.gen, self.discr, tcfg, perceptual_fn, mesh
        )
        self.eval_step = make_eval_step(
            self.gen, self.discr, tcfg, perceptual_fn, mesh
        )
        self.predict = make_predict_fn(self.gen, mesh)
        self.state: Optional[GANTrainState] = None

    def init(self, seed: int = 0) -> GANTrainState:
        self.state = create_gan_state(
            jax.random.PRNGKey(seed),
            self.input_modality,
            self.config.model,
            self.config.train,
            patch_size=self.config.data.patch_size,
        )
        return self.state

    @classmethod
    def load_from_checkpoint(
        cls, checkpoint_path: str, input_modality: str, **kw
    ) -> "bSSFPToDWITensorModel":
        model = cls(input_modality, **kw)
        model.init()
        model.state = load_checkpoint(checkpoint_path, model.state)
        return model

    def forward(self, x: jax.Array) -> jax.Array:
        assert self.state is not None, "call init() or load_from_checkpoint()"
        return self.predict(self.state, x)

    __call__ = forward

    def unpack_batch(self, batch: Dict[str, jax.Array], test: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
        """Input/target selection (reference ``src/model.py:195-199``):
        augmented-free ``dwi-tensor_orig`` in train/val, ``dwi-tensor`` in
        test."""
        x = batch[self.input_modality]
        y = batch["dwi-tensor" if test else "dwi-tensor_orig"]
        return x, y


class MultiInputUNetModel:
    """Stateful convenience wrapper over :class:`MultiInputUNet` exposing the
    reference's multi-stage API surface (``src/eval.py:18-19,199`` calls
    ``model.change_training_state(state, modality)``): holds the current
    (stage, modality, params) and rebuilds the jitted step/predict functions
    on state changes, grafting the backbone across modalities."""

    def __init__(self, state: "TrainingState" = None, config: Optional[Config] = None):
        from unet_bssfp_tpu.models.multi_input_unet import TrainingState as TS

        self.config = config or Config()
        self.state_enum = state or TS.PRETRAIN
        self.modality = "dwi-tensor"
        self.params = None
        self._build()

    def _build(self):
        from unet_bssfp_tpu.train.multistage import (
            build_multi_input_unet,
            create_supervised_state,
            make_supervised_eval_step,
            make_supervised_train_step,
        )

        self.net = build_multi_input_unet(self.modality, self.config.model)
        self.sup_state = create_supervised_state(
            jax.random.PRNGKey(self.config.train.seed),
            self.net,
            self.config.train,
            self.state_enum,
            self.config.data.patch_size,
            params=self.params,
        )
        self.params = self.sup_state.params
        self.train_step = make_supervised_train_step(
            self.net, self.config.train, self.state_enum, self.params
        )
        self.eval_step = make_supervised_eval_step(self.net, self.config.train)

    def step(self, x: jax.Array, y: jax.Array):
        """Run one training step, absorbing the new state into the wrapper
        (the functional ``train_step`` returns state; this keeps
        ``self.params`` current so ``change_training_state`` grafts the
        *trained* backbone)."""
        self.sup_state, metrics = self.train_step(self.sup_state, x, y)
        self.params = self.sup_state.params
        return metrics

    def change_training_state(self, state: "TrainingState", modality: str) -> None:
        """Switch stage/modality (reference ``src/eval.py:199``): TRANSFER
        swaps the input head for the new modality and freezes the backbone;
        FINE_TUNE unfreezes at the reduced lr. Carries the current (trained)
        parameters across the switch."""
        from unet_bssfp_tpu.train.multistage import transfer_params

        self.params = self.sup_state.params
        old_params = self.params
        self.state_enum = state
        if modality != self.modality:
            self.modality = modality
            from unet_bssfp_tpu.train.multistage import build_multi_input_unet

            net = build_multi_input_unet(modality, self.config.model)
            if old_params is not None:
                self.params = transfer_params(
                    old_params, net, jax.random.PRNGKey(1),
                    self.config.data.patch_size,
                )
        self._build()

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.net.apply({"params": self.params}, x, train=False)


def check_input_shape(volume_shape, strides=(2, 2, 2, 2)) -> None:
    """Validate volume-dim/stride divisibility for the U-Net depth (reference
    ``check_input_shape``, ``src/model.py:95-120`` — rewritten against the
    actual architecture: 4 pooling stages need /2^4 divisibility)."""
    factor = int(np.prod(strides))
    for v in volume_shape[:3]:
        if v % factor != 0:
            raise ValueError(
                f"dim {v} not divisible by {factor} "
                f"(4 pooling stages); pad or crop first"
            )
