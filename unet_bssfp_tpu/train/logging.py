"""Metric logging: CSV always, W&B when configured.

Replaces the reference's Lightning ``self.log(..., sync_dist=True,
on_epoch=True)`` + ``WandbLogger`` stack (``src/train.py:16-18``,
``src/model.py:178-179`` et al.). Metric names follow the reference scheme
(``{step}_{gen|discr}_loss[_recon_{L1|Perceptual}]``,
``{step}_metric_{PSNR|SSIM|L1|FID}``) so downstream report tooling
(``eval.plots``) keys match. Epoch aggregation averages the per-step values
(the ``on_epoch=True`` reduction).
"""

from __future__ import annotations

import csv
import os
import time
from collections import defaultdict
from typing import Dict, Optional

#: Minimum seconds between heartbeat-file touches in ``log_step`` (the
#: touch itself is microseconds; throttling just keeps it off the syscall
#: profile of tight CPU-smoke loops).
HEARTBEAT_INTERVAL_S = 15.0


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        wandb_project: Optional[str] = None,
        run_name: Optional[str] = None,
    ):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._epoch_acc: Dict[str, list] = defaultdict(list)
        self._rows = []
        self._fieldnames = ["epoch"]
        self._csv_path = os.path.join(log_dir, "metrics.csv")
        self._heartbeat_path = os.path.join(log_dir, "heartbeat")
        self._heartbeat_last = float("-inf")
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=run_name, dir=log_dir
                )
            except Exception:
                self._wandb = None

    def log_step(self, metrics: Dict[str, float]) -> None:
        # Keep device arrays as-is: float() here would synchronize the host
        # on every step and forfeit async dispatch; conversion happens once
        # per epoch in end_epoch.
        for k, v in metrics.items():
            self._epoch_acc[k].append(v)
        # Step-granular liveness for the stall watchdog: metrics.csv is only
        # rewritten at epoch end, which left long epochs (or the first
        # epoch's cache+compile) indistinguishable from a wedged device RPC.
        now = time.monotonic()
        if now - self._heartbeat_last >= HEARTBEAT_INTERVAL_S:
            self._heartbeat_last = now
            try:
                with open(self._heartbeat_path, "w") as f:
                    f.write(f"{time.time():.0f}\n")
            except OSError:
                pass

    def end_epoch(self, epoch: int, extra: Optional[Dict[str, float]] = None
                  ) -> Dict[str, float]:
        row: Dict[str, float] = {
            k: float(sum(float(x) for x in v) / len(v))
            for k, v in self._epoch_acc.items()
            if v
        }
        if extra:
            row.update({k: float(v) for k, v in extra.items()})
        self._epoch_acc.clear()
        row_out = {"epoch": epoch, **row}
        self._rows.append(row_out)
        for k in row_out:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        with open(self._csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writeheader()
            writer.writerows(self._rows)
        if self._wandb is not None:
            self._wandb.log(row, step=epoch)
        return row

    def write_table(self, name: str, row: Dict[str, float]) -> str:
        """Write a single-row CSV (e.g. ``test_metrics.csv`` consumed by
        ``plot_nn_metrics``, reference ``src/plot_metrics_errors.py:22-27``).
        """
        path = os.path.join(self.log_dir, name)
        with open(path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(row.keys()))
            writer.writeheader()
            writer.writerow({k: float(v) for k, v in row.items()})
        return path

    @property
    def wandb_enabled(self) -> bool:
        """True when a live W&B run backs this logger."""
        return self._wandb is not None

    def log_artifact(
        self,
        path: str,
        name: str,
        type: str = "model",
        metadata: Optional[Dict[str, float]] = None,
    ) -> None:
        """Push a checkpoint directory/file as a W&B artifact — the
        ``WandbLogger(log_model='all')`` behaviour (reference
        ``src/train.py:16-18``). No-op when W&B is not configured."""
        if self._wandb is None:
            return
        try:
            import wandb

            art = wandb.Artifact(name, type=type, metadata=metadata or {})
            if os.path.isdir(path):
                art.add_dir(path)
            else:
                art.add_file(path)
            self._wandb.log_artifact(art)
        except Exception:
            pass  # artifact upload must never sink a training run

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


class EarlyStopping:
    """Min-mode early stopping (reference
    ``EarlyStopping(monitor='val_gen_loss_recon', patience=10)``,
    ``src/train.py:19-20``)."""

    def __init__(self, monitor: str, patience: int = 10, mode: str = "min"):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.count = 0

    def update(self, metrics: Dict[str, float]) -> bool:
        """Returns True when training should stop."""
        value = metrics.get(self.monitor)
        if value is None:
            return False
        value = float(value)
        improved = self.best is None or (
            (value < self.best) if self.mode == "min" else (value > self.best)
        )
        if improved:
            self.best = value
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.patience
