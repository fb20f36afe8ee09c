#!/usr/bin/env python3
"""Saturated quality run + the reference's judged artifact (round-4 VERDICT
items 1 and 3).

One end-to-end pass on the linked synthetic fixture:

1. Train pc-bSSFP -> DT with the reference's early-stop semantics
   (monitor ``val_gen_loss_recon``, patience 10, ``/root/reference/src/
   train.py:19-20``) until it actually triggers (or ``--max-epochs``),
   logging BOTH the reference-parity augmented val metrics and a clean
   (un-augmented) val pass per epoch (``TrainConfig.log_clean_val``) so the
   cost of the reference's augmented-val convention is a measured number.
2. Append the run to ``CONVERGENCE.json`` (``saturated`` + clean-val keys).
3. Push the BEST checkpoint through the full judged-artifact chain the
   project is ultimately evaluated on (reference ``src/eval.py:261-317``,
   README claim ``README.md:4``): grid-stitched test inference ->
   scalar maps -> diff maps -> probseg-weighted ROI error table ->
   ``relative_errors.csv`` / ``sample_stats.csv`` / plots.
4. Write ``QUALITY.json`` at the repo root (per-ROI median relative errors,
   the <=10% diag-band verdict on the synthetic task, test PSNR/SSIM) and
   copy the CSV artifacts into ``quality/``.

Denormalisation note: the linked fixture's DT lives natively in [0, 1] —
there is no scanner normalisation to invert, so the headline table is
computed in fixture-native space (identity denorm). A secondary table with
the real ``constants/rescale_args_dwi.txt`` inversion applied is recorded as
``denorm_table`` to exercise the full reference chain; its relative errors
cross zero per channel and are not the headline.

Usage (real chip; hours — run under ``timeout`` in the background):
    python scripts/quality_record.py --max-epochs 120
CPU smoke:
    UNET_BSSFP_PLATFORM=cpu python scripts/quality_record.py --smoke \
        --max-epochs 2
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_config(args, bids):
    from unet_bssfp_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )

    if args.smoke:
        vol, patch, batch = (24, 32, 32), 16, 4
        features = (4, 8, 8, 16, 16, 4)
        disc_features = (8, 8, 16)
        dtype = "float32"
    else:
        vol, patch, batch = (96, 128, 128), 64, 8
        features = (32, 64, 128, 256, 512, 32)
        disc_features = (32, 64, 128, 256, 512)
        dtype = "bfloat16"
    return Config(
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
            disc_features=disc_features,
            compute_dtype=dtype,
        ),
        train=TrainConfig(
            log_dir=os.path.join(args.workdir, "logs"),
            checkpoint_dir=os.path.join(args.workdir, "ckpts"),
            max_epochs=args.max_epochs,
            with_perceptual=False,  # the benched L1+BCE objective (see
            # CONVERGENCE.json full_objective record for why)
            log_clean_val=True,
            seed=42,
        ),
    )


def make_fixture(args):
    """Same cache convention as scripts/convergence_bench.py."""
    import tempfile

    from unet_bssfp_tpu.data.synthetic import make_synthetic_bids

    subjects = 6 if args.smoke else 12
    vol = (24, 32, 32) if args.smoke else (96, 128, 128)
    cache = os.environ.get(
        "CONVBENCH_DATA",
        os.path.join(
            tempfile.gettempdir(),
            f"convbench_data_{'smoke' if args.smoke else 'full'}"
            f"_s{subjects}_linked",
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
        seed=0,
        linked=True,
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return bids


def train(args, cfg, bids):
    import jax

    from unet_bssfp_tpu.data.datamodule import DoveDataModule
    from unet_bssfp_tpu.train.loop import Trainer

    data = DoveDataModule(bids, config=cfg.data)
    trainer = Trainer(cfg, args.modality)
    state = None
    if args.resume:
        # Continue a crashed run from its last complete checkpoint: the
        # saved GANTrainState carries both optimizers, BN stats and the
        # step RNG. The early-stop counter restarts (best-so-far resets to
        # the first resumed epoch), which can only lengthen training —
        # acceptable for a saturation record; the entry carries
        # ``resumed_from`` so the splice is visible.
        from unet_bssfp_tpu.train.checkpoint import load_checkpoint

        state = load_checkpoint(args.resume, trainer.init_state())
        print(f"resumed state from {args.resume}")
    t0 = datetime.datetime.now()
    state, best_ckpt = trainer.fit(
        data, state=state, max_epochs=args.max_epochs
    )
    wall = (datetime.datetime.now() - t0).total_seconds()
    trainer.logger.finish()

    import csv

    runs = sorted(os.listdir(cfg.train.log_dir))
    metrics_csv = os.path.join(cfg.train.log_dir, runs[-1], "metrics.csv")
    with open(metrics_csv) as f:
        rows = list(csv.DictReader(f))
    return data, best_ckpt, metrics_csv, rows, wall, jax.devices()[0]


def convergence_entry(args, rows, wall, device):
    def f(row, key):
        return round(float(row[key]), 4) if key in row and row[key] else None

    new_epochs = len(rows)
    if args.prior_metrics:
        import csv

        with open(args.prior_metrics) as fh:
            rows = list(csv.DictReader(fh)) + rows
    first, last = rows[0], rows[-1]
    best_psnr = max(float(r["val_metric_PSNR"]) for r in rows)
    entry = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "git": git_rev(),
        "device": device.device_kind,
        "smoke": args.smoke,
        "full_objective": False,
        "linked": True,
        "samples_per_vol": args.samples_per_vol,
        "epochs": len(rows),
        "saturated": new_epochs < args.max_epochs,
        "wall_seconds": round(wall, 1),
        "train_L1_first": f(first, "train_gen_loss_recon_L1"),
        "train_L1_last": f(last, "train_gen_loss_recon_L1"),
        "val_psnr_last": f(last, "val_metric_PSNR"),
        "val_psnr_best": round(best_psnr, 3),
        "val_ssim_last": f(last, "val_metric_SSIM"),
        "val_clean_psnr_last": f(last, "val_clean_metric_PSNR"),
        "val_clean_ssim_last": f(last, "val_clean_metric_SSIM"),
    }
    if entry["val_clean_psnr_last"] is not None:
        entry["clean_minus_aug_psnr"] = round(
            entry["val_clean_psnr_last"] - entry["val_psnr_last"], 3
        )
    if args.resume:
        entry["resumed_from"] = args.resume
    return entry


def git_rev():
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"


def judged_artifact(args, cfg, data, best_ckpt, quality_dir):
    """The full reference eval chain from the trained checkpoint."""
    import numpy as np
    import pandas as pd  # noqa: F401  (calc_error_table returns a frame)

    from unet_bssfp_tpu.eval.evaluate import (
        calc_error_table,
        eval_dwi_tensors,
        eval_model,
    )
    from unet_bssfp_tpu.eval.plots import (
        plot_nn_metrics,
        plot_rel_errors,
        plot_stacked_bar_scalars,
        plot_stacked_bar_tensors,
    )

    pred_base = os.path.join(args.workdir, "preds")
    pred_dir = os.path.join(pred_base, args.modality)
    if args.skip_eval:
        # Reuse a crashed chain's eval_model output (predictions + its
        # test_metrics.csv) instead of re-running device inference.
        import csv

        with open(os.path.join(pred_dir, "test_metrics.csv")) as fh:
            row = next(csv.DictReader(fh))
        test_metrics = {
            k: float(v) for k, v in row.items() if k != "modality"
        }
    else:
        test_metrics = eval_model(
            data, best_ckpt, args.modality, pred_dir, config=cfg
        )
    # Headline: fixture-native space (identity denorm — see module doc).
    eval_dwi_tensors(pred_dir, None)
    rel_csv = os.path.join(quality_dir, "relative_errors.csv")
    table = calc_error_table(pred_base, cfg.data.data_dir, rel_csv)

    plot_rel_errors(rel_csv, quality_dir)
    plot_stacked_bar_tensors(rel_csv, quality_dir)
    plot_stacked_bar_scalars(rel_csv, quality_dir)
    # Fourth reference report artifact (src/plot_metrics_errors.py:10-44):
    # eval_model wrote test_metrics.csv into pred_dir.
    plot_nn_metrics([pred_base], quality_dir)

    # Secondary: the real-constants inversion chain (reference
    # invert_dwi_tensor_norm, src/eval.py:39-70) exercised end-to-end.
    denorm_summary = None
    if not args.smoke:
        denorm_base = os.path.join(args.workdir, "preds_denorm")
        denorm_dir = os.path.join(denorm_base, args.modality)
        shutil.copytree(
            pred_dir, denorm_dir,
            ignore=shutil.ignore_patterns("*_denorm*", "*_fa*", "*_md*",
                                          "*_ad*", "*_rd*", "*_azimuth*",
                                          "*_inclination*", "*_rgb*",
                                          "diff-*"),
        )
        rescale = os.path.join(REPO, "constants", "rescale_args_dwi.txt")
        eval_dwi_tensors(denorm_dir, rescale)
        denorm_csv = os.path.join(quality_dir, "relative_errors_denorm.csv")
        denorm_table = calc_error_table(
            denorm_base, cfg.data.data_dir, denorm_csv
        )
        if not denorm_table.empty:
            med = denorm_table.groupby("roi").median(numeric_only=True)
            denorm_summary = {
                roi: {c: round(float(v), 4) for c, v in row.items()}
                for roi, row in med.iterrows()
            }

    # Per-ROI medians across test files — the numbers the README's <=10%
    # diag-band claim is stated over (reference README.md:4).
    diag = ["dxx", "dyy", "dzz"]
    offdiag = ["dxy", "dxz", "dyz"]
    med = table.groupby("roi").median(numeric_only=True)
    per_roi = {
        roi: {c: round(float(v), 4) for c, v in row.items()}
        for roi, row in med.iterrows()
    }
    diag_median = float(np.median(med[diag].to_numpy()))
    summary = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "git": git_rev(),
        "checkpoint": best_ckpt,
        "modality": args.modality,
        "smoke": bool(args.smoke),
        "task": ("linked synthetic fixture "
                 f"({6 if args.smoke else 12} subjects, "
                 f"{args.modality} -> DT)"),
        "space": "fixture-native (identity denorm; see quality_record.py)",
        "test_metrics": {
            k: round(float(v), 4) for k, v in test_metrics.items()
        },
        "per_roi_median_rel_err": per_roi,
        "diag_median_rel_err": round(diag_median, 4),
        "diag_band_le_10pct": bool(diag_median <= 0.10),
        "offdiag_median_rel_err": round(
            float(np.median(med[offdiag].to_numpy())), 4
        ),
        # Denominator-floored companions (relative_error_map_floored):
        # RD and the off-diagonals cross zero voxel-wise, so their RAW
        # relative error is unbounded by construction (thesis
        # 04-results.tex:16-17,64-66) — these columns bound the denominator
        # to separate model error from denominator pathology.
        "offdiag_median_rel_err_floored": (
            round(float(np.median(
                med[[f"{c}_floored" for c in offdiag]].to_numpy())), 4)
            if all(f"{c}_floored" in med.columns for c in offdiag) else None
        ),
        "rd_median_rel_err_floored": (
            round(float(np.median(med["rd_floored"].to_numpy())), 4)
            if "rd_floored" in med.columns else None
        ),
        "denorm_per_roi_median_rel_err": denorm_summary,
        "artifacts": {
            "relative_errors_csv": os.path.relpath(rel_csv, REPO),
            "sample_stats_csv": os.path.relpath(
                os.path.join(quality_dir, "sample_stats.csv"), REPO
            ),
        },
    }
    return summary


def resolve_auto_resume(args) -> None:
    """``--resume auto``: discover the newest complete checkpoint and all
    prior metrics segments under ``--workdir`` so the command is safe to
    re-run verbatim (the contract ``scripts/train_watchdog.py`` relies on).

    Falls back to a fresh run when the workdir has no checkpoints yet.
    Orbax writes ``<epoch>.orbax-checkpoint-tmp`` during a save and renames
    on completion, so integer-named dirs are complete by construction.
    """
    args.resume = None
    ckpt_root = os.path.join(args.workdir, "ckpts")
    if os.path.isdir(ckpt_root):
        for run in sorted(os.listdir(ckpt_root), reverse=True):
            run_dir = os.path.join(ckpt_root, run)
            epochs = [int(d) for d in os.listdir(run_dir) if d.isdigit()] \
                if os.path.isdir(run_dir) else []
            if epochs:
                args.resume = os.path.join(run_dir, str(max(epochs)))
                break
    log_root = os.path.join(args.workdir, "logs")
    segments = sorted(
        p for p in (
            os.path.join(log_root, run, "metrics.csv")
            for run in (os.listdir(log_root) if os.path.isdir(log_root)
                        else [])
        )
        if os.path.exists(p) and os.path.getsize(p) > 0
    )
    if args.resume and segments:
        combined = os.path.join(args.workdir, "prior_metrics_combined.csv")
        with open(combined, "w") as out:
            for i, seg in enumerate(segments):
                with open(seg) as fh:
                    if i > 0:
                        next(fh, None)  # drop duplicate headers
                    out.write(fh.read())
        args.prior_metrics = combined
    print(f"auto-resume: checkpoint={args.resume} "
          f"prior_segments={len(segments) if args.resume else 0}")


def device_startup_probe(grace_s: float, timeout_s: float) -> None:
    """Fail fast when the device tunnel won't admit this client.

    ``UNET_BSSFP_STARTUP_TIMEOUT`` (seconds) overrides ``timeout_s`` at
    every call site: observed 2026-08-20, a degraded-but-alive tunnel
    served a trivial ``jit`` compile in 115 s — inside a wide bound but
    past the 150 s default, so the probe mis-diagnosed a wedge and the
    watchdog's rapid retries (each an os._exit mid-RPC) made the server
    sicker. Widen the bound instead of hammering a slow server.

    Observed failure mode (round-5 launch log, BENCH_NOTES_r5 §9): after a
    recent client death the tunneled device server can leave a fresh
    client's first RPC waiting FOREVER (zero CPU, `wait_woken`), which the
    stall watchdog only catches after a full stall window. A hung RPC is
    uninterruptible from inside the process, so the probe arms a hard
    ``os._exit(75)`` timer: exiting crashes the attempt quickly and lets
    ``train_watchdog --restart-on-crash`` retry the attach cheaply until
    the server-side lease clears. ``grace_s`` idles before the first
    device op — server cleanup of a dead predecessor appears to need quiet
    time, and an early attach can wedge the queue for everyone.
    """
    import threading
    import time

    env = os.environ.get("UNET_BSSFP_STARTUP_TIMEOUT")
    if env:
        timeout_s = float(env)
    if grace_s > 0:
        print(f"startup: {grace_s:.0f}s grace before first device op",
              flush=True)
        time.sleep(grace_s)
    timer = threading.Timer(timeout_s, lambda: (
        print(f"startup: device probe exceeded {timeout_s:.0f}s — "
              "exiting for watchdog retry", flush=True),
        os._exit(75),
    ))
    timer.daemon = True
    timer.start()
    import unet_bssfp_tpu  # noqa: F401  (applies UNET_BSSFP_PLATFORM)
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    out = float(jax.jit(lambda x: (x * x).sum())(jnp.ones((128, 128))))
    timer.cancel()
    print(f"startup: device probe ok ({out:.0f}) on "
          f"{jax.devices()[0].device_kind} in "
          f"{time.monotonic() - t0:.1f}s", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--max-epochs", type=int, default=120)
    ap.add_argument("--samples-per-vol", type=int, default=32)
    ap.add_argument("--modality", default="pc-bssfp")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--workdir", default=None,
                    help="run directory (checkpoints/logs/predictions); "
                         "default /tmp/quality_run")
    ap.add_argument("--skip-train", default=None, metavar="CKPT",
                    help="skip training; run the judged-artifact chain on "
                         "this checkpoint")
    ap.add_argument("--skip-eval", action="store_true",
                    help="with --skip-train: reuse existing predictions + "
                         "test_metrics.csv in the workdir instead of "
                         "re-running device inference")
    ap.add_argument("--resume", default=None, metavar="CKPT",
                    help="resume training from this checkpoint directory "
                         "(a crashed run's last complete save); the "
                         "special value 'auto' discovers the newest "
                         "complete checkpoint and prior metrics under "
                         "--workdir (fresh run when none), making the "
                         "command idempotently re-runnable under "
                         "scripts/train_watchdog.py")
    ap.add_argument("--prior-metrics", default=None, metavar="CSV",
                    help="with --resume: the crashed run's metrics.csv, "
                         "spliced before the new rows in the convergence "
                         "entry")
    ap.add_argument("--startup-grace", type=float, default=45.0,
                    help="seconds to idle before the first device op "
                         "(server-side cleanup of a dead predecessor "
                         "needs quiet time; see device_startup_probe)")
    ap.add_argument("--startup-probe-timeout", type=float, default=150.0,
                    help="hard exit(75) when the first device op hangs "
                         "longer than this — cheap watchdog-retry instead "
                         "of a full stall window (0 disables the probe)")
    args = ap.parse_args()
    if args.workdir is None:
        args.workdir = os.path.join(
            "/tmp", "quality_run_smoke" if args.smoke else "quality_run"
        )
    os.makedirs(args.workdir, exist_ok=True)
    if args.resume == "auto":
        resolve_auto_resume(args)
    quality_dir = os.path.join(REPO, "quality")
    os.makedirs(quality_dir, exist_ok=True)

    if args.startup_probe_timeout > 0:
        device_startup_probe(args.startup_grace, args.startup_probe_timeout)
    bids = make_fixture(args)
    cfg = build_config(args, bids)

    if args.skip_train:
        from unet_bssfp_tpu.data.datamodule import DoveDataModule

        data = DoveDataModule(bids, config=cfg.data)
        data.setup()
        best_ckpt = args.skip_train
    else:
        data, best_ckpt, metrics_csv, rows, wall, device = train(
            args, cfg, bids
        )
        dst = os.path.join(quality_dir, "metrics.csv")
        if args.prior_metrics:
            # Splice the crashed segment's rows before the resumed ones so
            # the committed curve is the full trajectory.
            with open(dst, "w") as out, open(args.prior_metrics) as a, \
                    open(metrics_csv) as b:
                out.write(a.read())
                next(b)  # duplicate header
                out.write(b.read())
        else:
            shutil.copy(metrics_csv, dst)
        entry = convergence_entry(args, rows, wall, device)
        print(json.dumps(entry, indent=2))
        record_path = os.path.join(REPO, "CONVERGENCE.json")
        history = []
        if os.path.exists(record_path):
            with open(record_path) as f:
                history = json.load(f)
        history.append(entry)
        with open(record_path, "w") as f:
            json.dump(history, f, indent=2)
            f.write("\n")
        print(f"recorded to {record_path}")

    print(f"judged-artifact chain from {best_ckpt}")
    summary = judged_artifact(args, cfg, data, best_ckpt, quality_dir)
    out = os.path.join(REPO, "QUALITY.json")
    history = []
    if os.path.exists(out):
        with open(out) as f:
            history = json.load(f)
    history.append(summary)
    with open(out, "w") as f:
        json.dump(history, f, indent=2)
        f.write("\n")
    print(json.dumps(summary, indent=2))
    print(f"recorded to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
