#!/usr/bin/env python3
"""Convert a Med3D (MedicalNet) torch checkpoint to the ``.npz`` format
``unet_bssfp_tpu`` loads for the perceptual loss and FID.

The reference gets these weights through MONAI's
``PerceptualLoss(network_type='medicalnet_resnet10_23datasets')``
(reference ``src/model.py:127-129``), which downloads
``resnet_10_23dataset.pth`` from the Tencent MedicalNet release (Chen et al.
2019, https://github.com/Tencent/MedicalNet). This environment has no
network egress, so conversion is a one-time offline step:

    python tools/convert_medicalnet.py resnet_10_23dataset.pth \
        medicalnet_resnet10.npz

then EITHER drop the output at ``<repo>/weights/medicalnet_resnet10.npz``
(auto-discovered — the whole stack flips to parity mode with zero code
changes), set ``$UNET_BSSFP_MEDICALNET``, or point a run at it explicitly:

    python -m src.train --medicalnet-weights medicalnet_resnet10.npz ...

Pinned upstream identity (no egress here, so identity is enforced by the
structural fingerprint in ``models/medicalnet.py::MEDICALNET_FINGERPRINT``
and the source SHA256 recorded into the ``.npz``):

  - MONAI name: ``medicalnet_resnet10_23datasets`` (what the reference
    constructs, ``src/model.py:127-129``)
  - torch.hub mirror: ``warvito/MedicalNet-models``
  - original release: Tencent/MedicalNet ``resnet_10_23dataset.pth``
    (Chen et al. 2019, https://github.com/Tencent/MedicalNet)

The ``.npz`` holds the torch ``state_dict`` as numpy arrays (keys may keep
the ``module.`` DataParallel prefix; the loader strips it —
``models/medicalnet.py::load_torch_state_dict``) plus ``__source_sha256__``
/ ``__source_file__`` provenance entries.
"""

from __future__ import annotations

import argparse
import sys


def convert(src: str, dst: str) -> dict:
    import hashlib
    import os

    import numpy as np
    import torch

    from unet_bssfp_tpu.models.medicalnet import (
        MEDICALNET_SOURCE,
        check_medicalnet_fingerprint,
    )

    # Provenance: record the SHA256 of the torch file inside the .npz so
    # the converted weights stay traceable to the pinned upstream release
    # (MEDICALNET_SOURCE in models/medicalnet.py).
    with open(src, "rb") as f:
        sha256 = hashlib.sha256(f.read()).hexdigest()

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    # Med3D releases wrap the weights in {'state_dict': ...}.
    state_dict = ckpt.get("state_dict", ckpt)
    arrays = {
        k: v.detach().cpu().numpy()
        for k, v in state_dict.items()
        if hasattr(v, "detach")
    }
    if not arrays:
        raise ValueError(f"no tensors found in {src!r}")
    # Structural fingerprint of the pinned checkpoint — rejects the wrong
    # ResNet depth / a non-MedicalNet state dict before it can poison
    # perceptual/FID numbers downstream.
    check_medicalnet_fingerprint(arrays)
    print(f"source: {MEDICALNET_SOURCE['original_release']}")
    print(f"source sha256: {sha256}")
    np.savez(
        dst,
        __source_sha256__=np.asarray(sha256),
        __source_file__=np.asarray(os.path.basename(src)),
        **arrays,
    )
    return arrays


def verify(dst: str) -> None:
    """Round-trip the converted file through the Flax loader and run one
    forward pass."""
    import jax.numpy as jnp
    import numpy as np

    from unet_bssfp_tpu.models.medicalnet import (
        MedicalNetResNet10,
        load_torch_state_dict,
    )

    variables = load_torch_state_dict(dict(np.load(dst)))
    net = MedicalNetResNet10()
    out = net.apply(variables, jnp.zeros((1, 16, 16, 16, 1)), train=False)
    print(f"verify: feature map {out.shape}, finite={bool(jnp.isfinite(out).all())}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help="Med3D torch checkpoint (.pth)")
    ap.add_argument("dst", help="output .npz path")
    ap.add_argument(
        "--no-verify", action="store_true",
        help="skip the Flax round-trip check",
    )
    args = ap.parse_args(argv)
    arrays = convert(args.src, args.dst)
    print(f"wrote {args.dst}: {len(arrays)} tensors")
    if not args.no_verify:
        verify(args.dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
