from unet_bssfp_tpu.data.bids import BIDSIndex, parse_entities
from unet_bssfp_tpu.data.datamodule import DoveDataModule, SampleSpec
from unet_bssfp_tpu.data.transforms import crop_or_pad, rescale_intensity, znormalize
from unet_bssfp_tpu.data.sampler import (
    uniform_patch_starts,
    extract_patches,
    grid_patch_starts,
    GridAggregator,
)
from unet_bssfp_tpu.data.queue import PrefetchIterator

__all__ = [
    "BIDSIndex",
    "parse_entities",
    "DoveDataModule",
    "SampleSpec",
    "crop_or_pad",
    "rescale_intensity",
    "znormalize",
    "uniform_patch_starts",
    "extract_patches",
    "grid_patch_starts",
    "GridAggregator",
    "PrefetchIterator",
]
