"""Orbax checkpointing with top-k retention.

Equivalent of the reference's ``ModelCheckpoint(save_top_k=10,
monitor='val_loss', mode='min')`` (``src/train.py:21-27``) and
``load_from_checkpoint`` resume (``src/train.py:56-57``,
``src/eval.py:197``): the whole :class:`GANTrainState` pytree (both
parameter trees, both optimizer states, step counter, RNG key) is saved per
epoch and the k best by monitored metric are retained.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax

try:
    import orbax.checkpoint as ocp

    HAS_ORBAX = True
except Exception:  # pragma: no cover
    ocp = None
    HAS_ORBAX = False


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str = "val_loss",
        mode: str = "min",
        top_k: int = 10,
        config_json: Optional[str] = None,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if config_json is not None:
            # Hyperparameter embedding (the reference's
            # ``save_hyperparameters``, src/model.py:149): the config rides
            # with the checkpoints so a run is reconstructible from its
            # directory alone.
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(config_json)
        self.monitor = monitor
        self._best_step: Optional[int] = None
        self._best_value: Optional[float] = None
        options = ocp.CheckpointManagerOptions(
            max_to_keep=top_k,
            best_fn=lambda m: float(m[monitor]),
            best_mode=mode,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._mode = mode

    def save(self, step: int, state: Any, metrics: Dict[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items()}
        # Rows may lack the monitored metric (e.g. an epoch whose val split
        # produced no batches); rank such checkpoints worst instead of
        # crashing the best_fn.
        if self.monitor not in metrics:
            metrics[self.monitor] = (
                float("inf") if self._mode == "min" else float("-inf")
            )
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics,
        )
        value = metrics.get(self.monitor)
        if value is not None and (
            self._best_value is None
            or (value < self._best_value) == (self._mode == "min")
        ):
            self._best_value = value
            self._best_step = step

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def best_step(self) -> Optional[int]:
        self.wait()
        if self._best_step is not None:
            return self._best_step
        return self._mgr.best_step()

    def best_path(self) -> Optional[str]:
        step = self.best_step
        if step is None:
            return None
        return os.path.join(self.directory, str(step))

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (an abstract or
        concrete GANTrainState)."""
        self.wait()
        if step is None:
            step = self.best_step
            if step is None:
                step = self._mgr.latest_step()
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def close(self) -> None:
        self._mgr.close()


def find_latest_checkpoint(
    checkpoint_dir: str, modality: Optional[str] = None
) -> Optional[str]:
    """Newest step of the newest run under ``checkpoint_dir`` (optionally
    filtered by modality prefix) — powers ``--ckpt auto`` crash recovery."""
    root = os.path.abspath(checkpoint_dir)
    if not os.path.isdir(root):
        return None
    runs = sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
        and (modality is None or d.startswith(modality))
    )
    for run in reversed(runs):
        run_dir = os.path.join(root, run)
        steps = sorted(
            (int(s) for s in os.listdir(run_dir) if s.isdigit()),
            reverse=True,
        )
        for step in steps:
            step_dir = os.path.join(run_dir, str(step))
            if os.path.isdir(os.path.join(step_dir, "default")):
                return step_dir
    return None


def load_config_for_checkpoint(path: str) -> Optional[str]:
    """Find the ``config.json`` saved next to a checkpoint (walks up from an
    item/step directory to the manager root)."""
    path = os.path.abspath(path)
    for _ in range(3):
        candidate = os.path.join(path, "config.json")
        if os.path.exists(candidate):
            with open(candidate) as f:
                return f.read()
        path = os.path.dirname(path)
    return None


def load_checkpoint(path: str, state_like: Any) -> Any:
    """Load a single checkpoint directory saved by :class:`CheckpointManager`
    (``load_from_checkpoint`` equivalent). Accepts either the step directory
    (which contains the ``default`` item) or the item directory itself."""
    path = os.path.abspath(path)
    item = os.path.join(path, "default")
    if os.path.isdir(item):
        path = item
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, state_like)
