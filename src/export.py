"""Export a trained checkpoint to a self-contained serving artifact.

Freezes the eval-mode generator (weights baked in, StableHLO for CPU+TPU)
into one file that ``src/predict.py --exported`` — or any bare JAX process
via ``unet_bssfp_tpu.eval.export.load_exported`` — can serve without the
model code or checkpoint format. The deployment surface the reference
lacks (its eval path reloads the Lightning checkpoint in Python every
time, reference ``src/eval.py:21-41``).

Usage:
  python src/export.py --checkpoint CKPT --modality pc-bssfp \
      --out model.ubx [--patch] [--batch N] [--platforms cpu,tpu]
"""

from __future__ import annotations

import argparse
import os
import subprocess


def main() -> None:
    parser = argparse.ArgumentParser(
        description="checkpoint → serving artifact"
    )
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--modality", default="pc-bssfp")
    parser.add_argument("--out", required=True, help="artifact path (.ubx)")
    parser.add_argument("--config", default=None, help="JSON config path")
    parser.add_argument(
        "--batch", type=int, default=1, help="serving batch size"
    )
    parser.add_argument(
        "--patch", action="store_true",
        help="export at patch shape (for grid-stitched serving) instead of "
        "the whole-volume shape",
    )
    parser.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma-separated lowering targets",
    )
    args = parser.parse_args()

    import jax

    from unet_bssfp_tpu.config import MODALITY_CHANNELS, Config
    from unet_bssfp_tpu.eval.export import export_generator, save_exported
    from unet_bssfp_tpu.train.checkpoint import (
        load_checkpoint,
        load_config_for_checkpoint,
    )
    from unet_bssfp_tpu.train.state import create_gan_state

    if args.config:
        with open(args.config) as f:
            config = Config.from_json(f.read())
    else:
        saved = load_config_for_checkpoint(args.checkpoint)
        config = Config.from_json(saved) if saved else Config()

    state = create_gan_state(
        jax.random.PRNGKey(0), args.modality, config.model, config.train,
        patch_size=config.data.patch_size,
    )
    state = load_checkpoint(args.checkpoint, state)

    in_ch = MODALITY_CHANNELS[args.modality]
    if args.patch:
        spatial = (config.data.patch_size,) * 3
    else:
        spatial = tuple(config.data.volume_shape)
    shape = (args.batch, *spatial, in_ch)

    try:
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        git = "unknown"

    exported, meta = export_generator(
        args.modality, config.model, state, shape,
        platforms=tuple(p for p in args.platforms.split(",") if p),
        extra_meta={"checkpoint": os.path.abspath(args.checkpoint),
                    "git": git},
    )
    save_exported(exported, meta, args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(
        f"wrote {args.out} ({size_mb:.1f} MB): {args.modality} "
        f"{list(shape)} → {meta['out_channels']}ch, "
        f"platforms {meta['platforms']}"
    )


if __name__ == "__main__":
    main()
