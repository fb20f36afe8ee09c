from unet_bssfp_tpu.ops.pallas.conv3d import (
    conv3x3_packed,
    conv3x3_pfold,
    fold4_pack,
    pack_hw,
    packed_supported,
    pfold_supported,
    unfold4_unpack,
    unpack_hw,
)
from unet_bssfp_tpu.ops.pallas.fused_norm_act import (
    fused_instance_norm_leaky_relu,
    instance_norm_leaky_relu_reference,
)

__all__ = [
    "conv3x3_packed",
    "conv3x3_pfold",
    "fold4_pack",
    "pack_hw",
    "packed_supported",
    "pfold_supported",
    "unfold4_unpack",
    "unpack_hw",
    "fused_instance_norm_leaky_relu",
    "instance_norm_leaky_relu_reference",
]
