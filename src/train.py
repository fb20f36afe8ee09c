"""Public training driver mirroring the reference's ``src/train.py``.

``build_trainer_args``/``train_model`` keep the reference's knobs (max 50
epochs, early stop on ``val_gen_loss_recon`` patience 10, top-10 checkpoints
on ``val_loss``, optional debug profiling/anomaly mode,
``src/train.py:15-77``); ``__main__`` trains all four modalities sequentially
(``src/train.py:97-99``) with paths from CLI/config instead of hard-coded
cluster locations.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
from typing import Optional

from unet_bssfp_tpu.config import MODALITIES, Config
from unet_bssfp_tpu.data.datamodule import DoveDataModule
from unet_bssfp_tpu.train.loop import Trainer, train_model  # noqa: F401


def build_trainer_args(debug: bool, modality: str, config: Optional[Config] = None):
    """Mirror of the reference helper (``src/train.py:15-43``): returns the
    keyword set the Trainer consumes."""
    config = config or Config()
    return {
        "config": config,
        "modality": modality,
        "debug": debug,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="Train bSSFP→DT models")
    parser.add_argument("data_dir", help="BIDS dataset root")
    parser.add_argument(
        "--modalities", nargs="*", default=list(MODALITIES),
        help="modalities to train sequentially",
    )
    parser.add_argument("--config", default=None, help="JSON config path")
    parser.add_argument("--ckpt", default=None, help="resume checkpoint")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument(
        "--multistage", action="store_true",
        help="pretrain(autoencoder) -> transfer -> finetune regime "
        "(MultiInputUNet) instead of direct GAN training",
    )
    parser.add_argument(
        "--whole-volume", action="store_true",
        help="train/evaluate on whole (96,128,128) volumes instead of 64³ "
        "patches — the TPU fast path (same per-voxel cost as patch mode, "
        "measured 73 ns/voxel on v5e, with cleaner epoch semantics: one "
        "optimizer step sees each volume exactly once). Patch parity mode "
        "remains the default because it reproduces the reference's "
        "sampling regime (src/data_module.py:152-166) and its "
        "per-patch InstanceNorm statistics.",
    )
    args = parser.parse_args()

    config = Config()
    if args.config:
        with open(args.config) as f:
            config = Config.from_json(f.read())
    if args.whole_volume:
        import dataclasses

        config = dataclasses.replace(
            config,
            data=dataclasses.replace(config.data, whole_volume=True),
        )

    # W&B key bootstrap (reference src/train.py:81-84).
    if os.environ.get("WANDB_API_KEY") is None and os.path.exists(
        "wandb-api-key.json"
    ):
        with open("wandb-api-key.json") as f:
            os.environ["WANDB_API_KEY"] = json.load(f)["key"]

    print(f"Last run on {datetime.datetime.now()}")
    data = DoveDataModule(args.data_dir, config=config.data)
    data.prepare_data()

    for modality in args.modalities:
        if args.multistage:
            from unet_bssfp_tpu.models.multi_input_unet import TrainingState
            from unet_bssfp_tpu.train.multistage import run_multistage

            epochs = (
                {s: args.max_epochs for s in TrainingState}
                if args.max_epochs
                else None
            )
            _, row = run_multistage(
                data, modality, config, epochs_per_stage=epochs
            )
            print(f"Multi-stage {modality} final metrics: {row}")
        else:
            best = train_model(
                data,
                modality,
                ckpt_path=args.ckpt,
                debug=args.debug,
                config=config,
                max_epochs=args.max_epochs,
            )
            print(f"Best checkpoint for {modality}: {best}")


if __name__ == "__main__":
    main()
