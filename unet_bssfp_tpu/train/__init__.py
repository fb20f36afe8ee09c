from unet_bssfp_tpu.train.state import GANTrainState, create_gan_state
from unet_bssfp_tpu.train.steps import (
    make_train_step,
    make_eval_step,
    make_predict_fn,
)
from unet_bssfp_tpu.train.loop import train_model, Trainer

__all__ = [
    "GANTrainState",
    "create_gan_state",
    "make_train_step",
    "make_eval_step",
    "make_predict_fn",
    "train_model",
    "Trainer",
]
