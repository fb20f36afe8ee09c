"""unet_bssfp_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for MRI
modality-to-diffusion-tensor synthesis.

Rebuilds the capabilities of the reference PyTorch-Lightning stack
(SomeUserName1/UNet-bSSFP) TPU-first:

- ``ops``     — batched closed-form 3x3 symmetric eigensolver, DT scalar maps
                (FA/MD/AD/RD/azimuth/inclination/RGB), error maps, SSIM/PSNR,
                losses, Pallas kernels for the fused hot paths.
- ``models``  — Flax NNX-free linen modules: BasicUNet-3D generator with
                per-modality input heads, PatchGAN discriminator, MedicalNet
                ResNet10 feature extractor, MultiInputUNet (multi-stage regime).
- ``data``    — BIDS-aware discovery + seeded subject split, NIfTI IO, jitted
                preprocessing (crop-or-pad/rescale), RNG-keyed functional MRI
                augmentations, uniform patch sampling, grid-stitched inference,
                host prefetch queue.
- ``train``   — single-jit GAN train step data-parallel over a jax.sharding
                Mesh, multi-stage pretrain/transfer/finetune driver, Orbax
                checkpointing, early stopping, CSV/W&B metric logging.
- ``eval``    — on-device scalar-map/relative-error evaluation and the
                reporting/plotting stack.
- ``parallel``— mesh + sharding helpers (dp/spatial axes over ICI).

Reference parity citations in docstrings point into the reference repo as
``src/<file>.py:<line>``.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("UNET_BSSFP_PLATFORM"):
    # Force a JAX platform (e.g. "cpu" for debugging without a chip).
    # The plain JAX_PLATFORMS env var is not honoured when a TPU plugin is
    # registered, so the framework provides its own knob.
    import jax as _jax

    _jax.config.update(
        "jax_platforms", _os.environ["UNET_BSSFP_PLATFORM"]
    )
