from unet_bssfp_tpu.ops.pallas.fused_norm_act import (
    fused_instance_norm_leaky_relu,
    instance_norm_leaky_relu_reference,
)

__all__ = [
    "fused_instance_norm_leaky_relu",
    "instance_norm_leaky_relu_reference",
]
