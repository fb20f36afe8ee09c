#!/usr/bin/env python3
"""Multistage-vs-direct convergence record (round-4 VERDICT item 2).

The reference's headline quality numbers come from the pretrain → transfer →
finetune regime (thesis ``03-methods.tex:784-787``; finetune beats direct by
+2 to +9 dB in ``doc/thesis/img/finetune-test_metrics_all.csv``). This script
produces the framework's first convergence evidence for that regime: it runs

- the THREE-STAGE regime (``train/multistage.py::run_multistage``) with a
  fixed per-stage epoch budget, and
- a DIRECT supervised run on the target modality with the same total epoch
  budget, same loss (L1 + (1−SSIM)), same ``MultiInputUNet``,

on the linked synthetic fixture, and appends both to ``CONVERGENCE.json``
(``multistage: true`` / ``direct_supervised: true``) with the measured
finetune-vs-direct PSNR delta.

Usage (real chip; ~1h):
    python scripts/multistage_bench.py --pretrain 8 --transfer 4 --finetune 8
Two-cohort domain-transfer A/B (real chip; the measurement the thesis's
+2..+9 dB claim structurally requires — round-4 VERDICT item 4):
    python scripts/multistage_bench.py --two-cohort \
        --pretrain 8 --transfer 4 --finetune 8
CPU smoke:
    UNET_BSSFP_PLATFORM=cpu python scripts/multistage_bench.py --smoke \
        --pretrain 1 --transfer 1 --finetune 1 --samples-per-vol 2
"""

from __future__ import annotations

import argparse
import csv
import datetime
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
RECORD_PATH = os.path.join(REPO, "CONVERGENCE.json")


def git_rev() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"


def _cohort_bids(smoke: bool, subjects: int, vol, seed: int,
                 link_tag_offset: int, env_var: str = "CONVBENCH_DATA"):
    """Cached linked fixture; offset-0 shares the quality-record cache."""
    from unet_bssfp_tpu.data.synthetic import make_synthetic_bids

    suffix = f"_off{link_tag_offset}" if link_tag_offset else ""
    cache = os.environ.get(
        env_var if not link_tag_offset else f"{env_var}_B",
        os.path.join(
            tempfile.gettempdir(),
            f"convbench_data_{'smoke' if smoke else 'full'}"
            f"_s{subjects}_linked{suffix}",
        ),
    )
    marker = os.path.join(cache, ".complete")
    if os.path.exists(marker):
        return os.path.join(cache, "bids")
    bids = make_synthetic_bids(
        os.path.join(cache, "bids"),
        subjects=tuple(f"{i:02d}" for i in range(1, subjects + 1)),
        sessions=("1",),
        volume_shape=vol,
        seed=seed,
        linked=True,
        link_tag_offset=link_tag_offset,
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return bids


def build(args):
    from unet_bssfp_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from unet_bssfp_tpu.data.datamodule import DoveDataModule

    subjects = 6 if args.smoke else 12
    vol = (24, 32, 32) if args.smoke else (96, 128, 128)
    bids = _cohort_bids(args.smoke, subjects, vol, seed=0, link_tag_offset=0)

    if args.smoke:
        patch, batch = 16, 4
        features = (4, 8, 8, 16, 16, 4)
        dtype = "float32"
    else:
        patch, batch = 64, 8
        features = (32, 64, 128, 256, 512, 32)
        dtype = "bfloat16"
    workdir = tempfile.mkdtemp(prefix="msbench_")
    cfg = Config(
        data=DataConfig(
            data_dir=bids,
            batch_size=batch,
            patch_size=patch,
            samples_per_vol=args.samples_per_vol,
            volume_shape=vol,
            val_split=0.2,
            test_split=0.2,
            cache_volumes=True,
        ),
        model=ModelConfig(
            features=features,
            multistage_features=features,
            compute_dtype=dtype,
        ),
        train=TrainConfig(
            log_dir=os.path.join(workdir, "logs"),
            checkpoint_dir=os.path.join(workdir, "ckpts"),
            with_perceptual=False,
            # Stages run their full epoch budget (the A/B is budget-matched;
            # an early stop inside one arm would unbalance it).
            early_stop_patience=10_000,
            seed=42,
        ),
    )
    data = DoveDataModule(bids, config=cfg.data)
    if not args.two_cohort:
        return cfg, data, None
    # Two-cohort domain-transfer fixture (round-4 VERDICT item 4): the
    # offset-0 cohort above is the LARGE pretrain cohort; the TARGET cohort
    # is small (3/1/1 subject split) with a shifted _linked_map (different
    # input→target relation in the same family) and different fields
    # (seed 1) — the structure the thesis's +2..+9 dB finetune-vs-direct
    # claim depends on (03-methods.tex:784-787). Both arms train and are
    # judged on the target cohort; the multistage arm additionally
    # pretrains its DT autoencoder on the large cohort.
    import dataclasses

    target_subjects = 4 if args.smoke else 5
    bids_b = _cohort_bids(
        args.smoke, target_subjects, cfg.data.volume_shape, seed=1,
        link_tag_offset=10,
    )
    cfg_b = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data_dir=bids_b)
    )
    data_b = DoveDataModule(bids_b, config=cfg_b.data)
    return cfg_b, data_b, data


def stage_csv(cfg, modality, stage):
    path = os.path.join(
        cfg.train.log_dir, f"multistage-{modality}-{stage}", "metrics.csv"
    )
    with open(path) as f:
        return list(csv.DictReader(f))


def run_direct(args, cfg, data, modality):
    """Budget-matched direct arm: same net/loss/mesh as the multistage run,
    all parameters trainable at the base lr from scratch (the thesis's
    'direct training' comparator)."""
    import math

    import jax

    from unet_bssfp_tpu.models.multi_input_unet import TrainingState
    from unet_bssfp_tpu.parallel.mesh import make_mesh, shard_batch
    from unet_bssfp_tpu.train.logging import MetricLogger
    from unet_bssfp_tpu.train.multistage import (
        build_multi_input_unet,
        create_supervised_state,
        make_supervised_eval_step,
        make_supervised_train_step,
    )

    tcfg = cfg.train
    mesh = make_mesh(math.gcd(cfg.data.batch_size, len(jax.devices())))
    net = build_multi_input_unet(modality, cfg.model, mesh=mesh)
    key = jax.random.PRNGKey(tcfg.seed)
    # PRETRAIN stage semantics = everything trainable at the base lr.
    stage = TrainingState.PRETRAIN
    state = create_supervised_state(
        key, net, tcfg, stage, cfg.data.patch_size
    )
    train_step = make_supervised_train_step(
        net, tcfg, stage, state.params, None, mesh
    )
    eval_step = make_supervised_eval_step(net, tcfg, None, mesh)
    logger = MetricLogger(os.path.join(tcfg.log_dir, f"direct-{modality}"))
    epochs = args.pretrain + args.transfer + args.finetune
    keys = (modality, "dwi-tensor")
    epoch_key = jax.random.PRNGKey(tcfg.seed + 17)
    n_dev = mesh.devices.size
    row = {}
    for epoch in range(epochs):
        epoch_key, k_tr, k_val = jax.random.split(epoch_key, 3)
        for batch in data.train_batches(k_tr, keys=keys, batch_divisor=n_dev):
            batch = shard_batch(mesh, batch)
            state, m = train_step(
                state, batch[modality], batch["dwi-tensor_orig"]
            )
            logger.log_step(m)
        for batch in data.val_batches(k_val, keys=keys, batch_divisor=n_dev):
            batch = shard_batch(mesh, batch)
            m, _ = eval_step(
                state, batch[modality], batch["dwi-tensor_orig"]
            )
            logger.log_step(m)
        row = logger.end_epoch(epoch)
    return row


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pretrain", type=int, default=8)
    ap.add_argument("--transfer", type=int, default=4)
    ap.add_argument("--finetune", type=int, default=8)
    ap.add_argument("--samples-per-vol", type=int, default=32)
    ap.add_argument("--modality", default="pc-bssfp")
    ap.add_argument("--two-cohort", action="store_true",
                    help="domain-transfer A/B: pretrain the DT autoencoder "
                         "on the large offset-0 cohort, transfer/finetune "
                         "and judge on a small shifted-map cohort; the "
                         "direct arm trains only on the small cohort with "
                         "the same total epoch budget")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    from quality_record import device_startup_probe

    device_startup_probe(grace_s=0.0, timeout_s=150.0)

    import jax

    from unet_bssfp_tpu.models.multi_input_unet import TrainingState
    from unet_bssfp_tpu.train.multistage import run_multistage

    cfg, data, pretrain_data = build(args)
    data.setup()
    if pretrain_data is not None:
        pretrain_data.setup()
    device = jax.devices()[0].device_kind

    t0 = datetime.datetime.now()
    _, ms_row = run_multistage(
        data, args.modality, config=cfg,
        epochs_per_stage={
            TrainingState.PRETRAIN: args.pretrain,
            TrainingState.TRANSFER: args.transfer,
            TrainingState.FINE_TUNE: args.finetune,
        },
        pretrain_data=pretrain_data,
    )
    ms_wall = (datetime.datetime.now() - t0).total_seconds()

    t0 = datetime.datetime.now()
    direct_row = run_direct(args, cfg, data, args.modality)
    direct_wall = (datetime.datetime.now() - t0).total_seconds()

    def f(row, key):
        return round(float(row[key]), 4) if row.get(key) is not None else None

    common = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "git": git_rev(),
        "device": device,
        "smoke": args.smoke,
        "linked": True,
        "samples_per_vol": args.samples_per_vol,
        "loss": "L1+(1-SSIM)",
        "model": "MultiInputUNet",
    }
    if args.two_cohort:
        common["cohorts"] = 2
        common["cohort_note"] = (
            "pretrain cohort: large offset-0 linked fixture; target "
            "cohort: small seed-1 link_tag_offset-10 fixture (shifted "
            "generating map); both arms judged on the target cohort's "
            "val split"
        )
    ms_entry = {
        **common,
        "multistage": True,
        "stage_epochs": {"pretrain": args.pretrain,
                         "transfer": args.transfer,
                         "finetune": args.finetune},
        "wall_seconds": round(ms_wall, 1),
        "val_psnr_last": f(ms_row, "val_metric_PSNR"),
        "val_ssim_last": f(ms_row, "val_metric_SSIM"),
        "val_l1_last": f(ms_row, "val_metric_L1"),
    }
    direct_entry = {
        **common,
        "multistage": False,
        "direct_supervised": True,
        "epochs": args.pretrain + args.transfer + args.finetune,
        "wall_seconds": round(direct_wall, 1),
        "val_psnr_last": f(direct_row, "val_metric_PSNR"),
        "val_ssim_last": f(direct_row, "val_metric_SSIM"),
        "val_l1_last": f(direct_row, "val_metric_L1"),
    }
    delta = None
    if ms_entry["val_psnr_last"] is not None and \
            direct_entry["val_psnr_last"] is not None:
        delta = round(
            ms_entry["val_psnr_last"] - direct_entry["val_psnr_last"], 3
        )
        ms_entry["multistage_minus_direct_psnr"] = delta
    print(json.dumps([ms_entry, direct_entry], indent=2))
    print(f"multistage - direct = {delta} dB "
          f"(reference band: +2 to +9 dB on real data)")

    if not args.no_record:
        history = []
        if os.path.exists(RECORD_PATH):
            with open(RECORD_PATH) as f_:
                history = json.load(f_)
        history += [ms_entry, direct_entry]
        with open(RECORD_PATH, "w") as f_:
            json.dump(history, f_, indent=2)
            f_.write("\n")
        print(f"recorded to {RECORD_PATH} ({len(history)} records)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
