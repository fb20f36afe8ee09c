"""Integration tests for the epoch drivers (Trainer.fit, run_multistage) and
the driver-facing multi-chip dryrun — end-to-end on a tiny synthetic BIDS set
over the 8-device virtual CPU mesh (SURVEY.md §4c/§4d).

Covers what the reference only ever exercised manually on the cluster:
training orchestration (reference ``src/train.py:46-77``), early stopping +
top-k checkpointing (``src/train.py:19-27``), resume
(``src/train.py:56-57``), and the multi-stage regime (thesis
03-methods.tex Training).
"""

import csv
import dataclasses
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from unet_bssfp_tpu.data.datamodule import DoveDataModule
from unet_bssfp_tpu.data.synthetic import make_synthetic_bids
from unet_bssfp_tpu.train.checkpoint import load_checkpoint
from unet_bssfp_tpu.train.loop import Trainer, train_model

pytestmark = pytest.mark.slow

VOL = (24, 32, 32)


@pytest.fixture(scope="module")
def bids_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bids"))
    return make_synthetic_bids(root, volume_shape=VOL, seed=3)


def _config(tmp_path, **train_kw):
    """Tiny end-to-end config: 3/1/1 subject split, 16³ patches, small nets."""
    return Config(
        data=DataConfig(
            batch_size=8,
            patch_size=16,
            samples_per_vol=2,
            volume_shape=VOL,
            val_split=0.2,
            test_split=0.2,
            num_workers=2,
            cache_volumes=True,
        ),
        model=ModelConfig(
            features=(4, 8, 8, 16, 16, 4),
            disc_features=(8, 8, 16),
            multistage_features=(4, 8, 8, 16, 16, 4),
            compute_dtype="float32",
        ),
        train=TrainConfig(
            log_dir=str(tmp_path / "logs"),
            checkpoint_dir=str(tmp_path / "ckpts"),
            checkpoint_top_k=2,
            # These tests target loop mechanics; the (default-on) MedicalNet
            # perceptual term is covered by test_perceptual_default_on.
            **{"with_perceptual": False, **train_kw},
        ),
    )


def _read_metrics(log_dir):
    runs = sorted(os.listdir(log_dir))
    assert runs, f"no runs under {log_dir}"
    path = os.path.join(log_dir, runs[-1], "metrics.csv")
    with open(path) as f:
        return list(csv.DictReader(f))


def test_trainer_fit_end_to_end(bids_root, tmp_path):
    """3 GAN epochs on the autoencoding modality: loss decreases, top-k
    checkpoints retained, best checkpoint restores into a fresh state."""
    cfg = _config(tmp_path, max_epochs=3)
    data = DoveDataModule(bids_root, config=cfg.data)
    trainer = Trainer(cfg, "dwi-tensor")
    assert trainer.mesh.devices.size == 8  # full virtual mesh in use
    state, best = trainer.fit(data)
    trainer.logger.finish()

    rows = _read_metrics(cfg.train.log_dir)
    assert len(rows) == 3
    for key in (
        "train_gen_loss",
        "train_gen_loss_recon_L1",
        "train_discr_loss",
        "val_gen_loss_recon",
        "val_loss",
        "epoch_seconds",
    ):
        assert key in rows[0], f"missing {key}"
        assert np.isfinite(float(rows[0][key]))
    first = float(rows[0]["train_gen_loss_recon_L1"])
    last = float(rows[-1]["train_gen_loss_recon_L1"])
    assert last < first, f"L1 did not descend: {first} -> {last}"

    # Top-k retention: at most top_k step dirs on disk.
    run_dir = os.path.dirname(best)
    steps = [d for d in os.listdir(run_dir) if d.isdigit()]
    assert 1 <= len(steps) <= cfg.train.checkpoint_top_k
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    # Resume-from-best restores a usable, step-advanced state.
    template = trainer.init_state()
    restored = load_checkpoint(best, template)
    assert int(restored.step) > 0
    # Restored params must match the in-memory state of the final epoch when
    # best == last saved step; at minimum they must drive the eval step.
    batch = next(
        iter(
            data.val_batches(
                jax.random.PRNGKey(0),
                keys=("dwi-tensor", "dwi-tensor"),
                batch_divisor=trainer.mesh.devices.size,
            )
        )
    )
    metrics, _ = trainer.eval_step(
        restored, batch["dwi-tensor"], batch["dwi-tensor_orig"]
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite after restore"
    if int(restored.step) == int(state.step):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.gen_params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]),
        )


def test_trainer_early_stop_on_plateau(bids_root, tmp_path):
    """A constant monitored metric (stubbed eval step; real GAN val loss
    drifts via BatchNorm running stats even at lr=0) ⇒ patience-1 early
    stopping ends the run after exactly 2 of 5 epochs."""
    cfg = _config(tmp_path, max_epochs=5, early_stop_patience=1)
    data = DoveDataModule(bids_root, config=cfg.data)
    trainer = Trainer(cfg, "dwi-tensor")
    real_eval = trainer.eval_step

    def plateau_eval(state, x, y):
        metrics, y_hat = real_eval(state, x, y)
        metrics = dict(metrics)
        metrics["val_gen_loss_recon"] = jnp.float32(1.0)
        return metrics, y_hat

    trainer.eval_step = plateau_eval
    trainer.fit(data)
    trainer.logger.finish()
    rows = _read_metrics(cfg.train.log_dir)
    assert len(rows) == 2, (
        f"expected early stop after 2 epochs, got {len(rows)}"
    )


def test_train_model_auto_resume(bids_root, tmp_path):
    """`ckpt_path='auto'` picks up the newest checkpoint and continues."""
    cfg = _config(tmp_path, max_epochs=1)
    data = DoveDataModule(bids_root, config=cfg.data)
    best1 = train_model(data, "dwi-tensor", config=cfg, max_epochs=1)
    assert best1 is not None
    best2 = train_model(
        data, "dwi-tensor", ckpt_path="auto", config=cfg, max_epochs=1
    )
    template = Trainer(cfg, "dwi-tensor").init_state()
    s1 = int(load_checkpoint(best1, template).step)
    s2 = int(load_checkpoint(best2, template).step)
    assert s2 > s1, f"resume did not advance the step counter: {s1} -> {s2}"


def test_run_multistage_end_to_end(bids_root, tmp_path):
    """All three stages run over the mesh; PReLU slopes exist and train."""
    from unet_bssfp_tpu.models.multi_input_unet import TrainingState
    from unet_bssfp_tpu.train.multistage import run_multistage

    cfg = _config(tmp_path, max_epochs=1)
    cfg = Config(
        data=dataclasses.replace(cfg.data, whole_volume=True),
        model=cfg.model,
        train=cfg.train,
        eval=cfg.eval,
    )
    data = DoveDataModule(bids_root, config=cfg.data)
    data.setup()
    states, row = run_multistage(
        data,
        "pc-bssfp",
        config=cfg,
        epochs_per_stage={s: 1 for s in TrainingState},
    )
    assert set(states) == set(TrainingState)
    assert "val_loss" in row and np.isfinite(row["val_loss"])

    # Learnable PReLU: slope leaves exist in the backbone and moved during
    # PRETRAIN (thesis activation, VERDICT item 7).
    import flax

    flat = flax.traverse_util.flatten_dict(
        states[TrainingState.PRETRAIN].params
    )
    slopes = [v for k, v in flat.items() if k[-1] == "prelu_slope"]
    assert slopes, "no prelu_slope params in MultiInputUNet"
    moved = any(
        float(jnp.abs(s - 0.25).max()) > 0 for s in slopes
    )
    assert moved, "PReLU slopes did not receive updates in PRETRAIN"

    # TRANSFER must not touch the backbone (including its PReLU slopes).
    flat_tr = flax.traverse_util.flatten_dict(
        states[TrainingState.TRANSFER].params
    )
    flat_pre = flax.traverse_util.flatten_dict(
        states[TrainingState.PRETRAIN].params
    )
    for k, v in flat_tr.items():
        if k[0] == "unet":
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(flat_pre[k]),
                err_msg=f"TRANSFER modified frozen backbone leaf {k}",
            )


def test_perceptual_default_on(bids_root, tmp_path):
    """The MedicalNet perceptual term (reference trains with it always,
    src/model.py:127-146) is tri-state: auto (None) resolves on iff
    pretrained weights exist — the random-feature term at 1e3 weighting is
    measured to hurt voxel fidelity (CONVERGENCE.json full_objective) — and
    an explicit True forces it on: one step, metrics gain
    train_gen_loss_recon_Perceptual."""
    from unet_bssfp_tpu.models.medicalnet import medicalnet_is_pretrained
    from unet_bssfp_tpu.train.loop import resolve_with_perceptual

    from unet_bssfp_tpu.train.loop import PERCEPTUAL_AUTO_MAX_FACTOR

    cfg = _config(tmp_path, max_epochs=1)
    tcfg_auto = dataclasses.replace(cfg.train, with_perceptual=None)
    assert TrainConfig().with_perceptual is None  # framework default: auto
    # auto == fingerprint-verified weights AND factor within the validated
    # bound (round-5 conservative policy); forcing overrides either way
    assert resolve_with_perceptual(tcfg_auto) == (
        medicalnet_is_pretrained(tcfg_auto.medicalnet_weights)
        and tcfg_auto.perceptual_factor <= PERCEPTUAL_AUTO_MAX_FACTOR
    )
    assert resolve_with_perceptual(
        dataclasses.replace(cfg.train, with_perceptual=True)
    )
    assert not resolve_with_perceptual(
        dataclasses.replace(cfg.train, with_perceptual=False)
    )
    cfg = Config(
        data=cfg.data,
        model=cfg.model,
        train=dataclasses.replace(cfg.train, with_perceptual=True),
        eval=cfg.eval,
    )
    data = DoveDataModule(bids_root, config=cfg.data)
    data.setup()
    trainer = Trainer(cfg, "dwi-tensor")
    assert trainer.perceptual_fn is not None
    state = trainer.init_state()
    batch = next(
        iter(
            data.train_batches(
                jax.random.PRNGKey(0),
                keys=("dwi-tensor", "dwi-tensor"),
                batch_divisor=trainer.mesh.devices.size,
            )
        )
    )
    state, metrics = trainer.train_step(
        state, batch["dwi-tensor"], batch["dwi-tensor_orig"]
    )
    assert "train_gen_loss_recon_Perceptual" in metrics
    assert np.isfinite(float(metrics["train_gen_loss_recon_Perceptual"]))


def test_eval_model_writes_fid(bids_root, tmp_path):
    """VERDICT item 3: the default test flow logs the MedicalNet FID
    (reference src/model.py:308-309). Without pretrained Med3D weights the
    column is provenance-tagged ``FID_random_features`` (VERDICT r2 weak #5)
    so it can never be silently mixed with the reference-comparable metric."""
    from unet_bssfp_tpu.eval.evaluate import eval_model

    cfg = _config(tmp_path, max_epochs=1)
    data = DoveDataModule(bids_root, config=cfg.data)
    best = train_model(data, "dwi-tensor", config=cfg, max_epochs=1)
    pred_dir = str(tmp_path / "preds")
    metrics = eval_model(data, best, "dwi-tensor", pred_dir, config=cfg)
    key = "test_metric_FID_random_features"
    assert key in metrics and "test_metric_FID" not in metrics
    assert np.isfinite(metrics[key])
    with open(os.path.join(pred_dir, "test_metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert key in rows[0]


def _load_graft_entry():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(root, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip():
    """The driver's multi-chip validation entry: even (dp×sp mesh) and odd
    (pure dp) device counts both execute one full GAN step."""
    graft = _load_graft_entry()
    graft.dryrun_multichip(8)
    graft.dryrun_multichip(3)


def test_log_clean_val(bids_root, tmp_path):
    """``TrainConfig.log_clean_val`` logs a second, un-augmented val pass as
    ``val_clean_*`` next to the reference-parity augmented ``val_*`` metrics
    (the reference augments val too, src/data_module.py:146-147); early stop
    still keys on the augmented monitor."""
    cfg = _config(tmp_path, max_epochs=1, log_clean_val=True)
    data = DoveDataModule(bids_root, config=cfg.data)
    trainer = Trainer(cfg, "dwi-tensor")
    trainer.fit(data)
    trainer.logger.finish()
    rows = _read_metrics(cfg.train.log_dir)
    for key in ("val_metric_PSNR", "val_clean_metric_PSNR",
                "val_clean_gen_loss_recon"):
        assert key in rows[0], f"missing {key}"
        assert np.isfinite(float(rows[0][key]))
