from unet_bssfp_tpu.models.layers import ConvBlock, TwoConv, Down, UpCat
from unet_bssfp_tpu.models.unet import BasicUNet3D
from unet_bssfp_tpu.models.generator import Generator
from unet_bssfp_tpu.models.discriminator import Discriminator
from unet_bssfp_tpu.models.medicalnet import MedicalNetResNet10
from unet_bssfp_tpu.models.multi_input_unet import MultiInputUNet, TrainingState

__all__ = [
    "ConvBlock",
    "TwoConv",
    "Down",
    "UpCat",
    "BasicUNet3D",
    "Generator",
    "Discriminator",
    "MedicalNetResNet10",
    "MultiInputUNet",
    "TrainingState",
]
