from unet_bssfp_tpu.ops.pallas.conv3d import (
    conv3x3_packed,
    pack_hw,
    packed_supported,
    unpack_hw,
)
from unet_bssfp_tpu.ops.pallas.fused_norm_act import (
    fused_instance_norm_leaky_relu,
    instance_norm_leaky_relu_reference,
)

__all__ = [
    "conv3x3_packed",
    "pack_hw",
    "packed_supported",
    "unpack_hw",
    "fused_instance_norm_leaky_relu",
    "instance_norm_leaky_relu_reference",
]
