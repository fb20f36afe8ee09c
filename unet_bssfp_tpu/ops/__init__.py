from unet_bssfp_tpu.ops.eig3 import eigh3x3_sym, eigh3x3_from_lower6
from unet_bssfp_tpu.ops.scalar_maps import (
    compute_scalar_maps,
    invert_dwi_tensor_norm,
    ScalarMaps,
)
from unet_bssfp_tpu.ops.error_maps import relative_error_map, angular_error_map
from unet_bssfp_tpu.ops.metrics import psnr, ssim3d, mae, fid
from unet_bssfp_tpu.ops.losses import (
    l1_loss,
    bce_with_logits,
    ssim_loss,
)

__all__ = [
    "eigh3x3_sym",
    "eigh3x3_from_lower6",
    "compute_scalar_maps",
    "invert_dwi_tensor_norm",
    "ScalarMaps",
    "relative_error_map",
    "angular_error_map",
    "psnr",
    "ssim3d",
    "mae",
    "fid",
    "l1_loss",
    "bce_with_logits",
    "ssim_loss",
]
