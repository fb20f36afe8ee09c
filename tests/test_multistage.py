"""Multi-stage pretrain/transfer/finetune regime tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.config import ModelConfig, TrainConfig
from unet_bssfp_tpu.models.multi_input_unet import TrainingState
from unet_bssfp_tpu.train.multistage import (
    build_multi_input_unet,
    create_supervised_state,
    make_supervised_eval_step,
    make_supervised_train_step,
    transfer_params,
)

pytestmark = pytest.mark.slow


MCFG = ModelConfig(compute_dtype="float32")
TCFG = TrainConfig()
PATCH = 16


def _small_net(modality):
    net = build_multi_input_unet(modality, MCFG)
    return net.copy(features=(4, 8, 8, 16, 16, 4))


def test_supervised_step_runs_and_descends():
    net = _small_net("dwi-tensor")
    state = create_supervised_state(
        jax.random.PRNGKey(0), net, TCFG, TrainingState.PRETRAIN, PATCH
    )
    step = make_supervised_train_step(
        net, TCFG, TrainingState.PRETRAIN, state.params
    )
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.random((2, PATCH, PATCH, PATCH, 6)).astype(np.float32))
    losses = []
    for _ in range(5):
        state, m = step(state, y, y)
        losses.append(float(m["train_loss"]))
        assert np.isfinite(losses[-1])
        assert "train_loss_L1" in m and "train_loss_SSIM" in m
    assert losses[-1] < losses[0]


def test_transfer_freezes_backbone():
    net = _small_net("pc-bssfp")
    state = create_supervised_state(
        jax.random.PRNGKey(0), net, TCFG, TrainingState.TRANSFER, PATCH
    )
    step = make_supervised_train_step(
        net, TCFG, TrainingState.TRANSFER, state.params
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, PATCH, PATCH, PATCH, 24)).astype(np.float32))
    y = jnp.asarray(rng.random((2, PATCH, PATCH, PATCH, 6)).astype(np.float32))
    new_state, _ = step(state, x, y)
    # unet subtree unchanged, head subtree updated.
    unet_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["unet"], new_state.params["unet"],
    )
    assert max(jax.tree_util.tree_leaves(unet_diff)) == 0.0
    head_key = [k for k in state.params if k.startswith("head")][0]
    head_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params[head_key], new_state.params[head_key],
    )
    assert max(jax.tree_util.tree_leaves(head_diff)) > 0.0


def test_transfer_params_grafts_backbone():
    pre_net = _small_net("dwi-tensor")
    pre_state = create_supervised_state(
        jax.random.PRNGKey(0), pre_net, TCFG, TrainingState.PRETRAIN, PATCH
    )
    tgt_net = _small_net("pc-bssfp")
    params = transfer_params(
        pre_state.params, tgt_net, jax.random.PRNGKey(1), PATCH
    )
    # Backbone identical to pretrained.
    same = jax.tree_util.tree_map(
        lambda a, b: bool((a == b).all()),
        pre_state.params["unet"], params["unet"],
    )
    assert all(jax.tree_util.tree_leaves(same))
    # New head exists for the 24-channel group.
    assert any(k.startswith("head") for k in params)


def test_supervised_eval_step():
    net = _small_net("dwi-tensor")
    state = create_supervised_state(
        jax.random.PRNGKey(0), net, TCFG, TrainingState.PRETRAIN, PATCH
    )
    eval_step = make_supervised_eval_step(net, TCFG)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.random((2, PATCH, PATCH, PATCH, 6)).astype(np.float32))
    m, y_hat = eval_step(state, y, y)
    assert y_hat.shape == y.shape
    for k in ("val_loss", "val_loss_L1", "val_loss_SSIM", "val_metric_PSNR"):
        assert np.isfinite(float(m[k])), k


def test_run_multistage_pretrain_data_routing(tmp_path):
    """``pretrain_data`` feeds ONLY the PRETRAIN stage; the target cohort
    (``data``) feeds TRANSFER and FINE_TUNE — the two-cohort regime the
    thesis's finetune-vs-direct comparison requires
    (``doc/thesis/03-methods.tex:784-787``)."""
    import dataclasses

    from unet_bssfp_tpu.config import Config, DataConfig, TrainConfig
    from unet_bssfp_tpu.parallel.mesh import make_mesh
    from unet_bssfp_tpu.train.multistage import run_multistage

    CH = {"dwi-tensor": 6, "pc-bssfp": 24, "dwi-tensor_orig": 6}

    class FakeData:
        """Minimal data-module stand-in recording which stage consumed it."""

        def __init__(self, patch):
            self.patch = patch
            self.calls = []

        def _batch(self, keys):
            rng = np.random.default_rng(0)
            out = {}
            for k in set(keys) | {"dwi-tensor_orig"}:
                out[k] = jnp.asarray(rng.random(
                    (2, self.patch, self.patch, self.patch, CH[k])
                ).astype(np.float32))
            return out

        def train_batches(self, key, keys, batch_divisor=1):
            self.calls.append(("train", tuple(keys)))
            yield self._batch(keys)

        def val_batches(self, key, keys, batch_divisor=1):
            self.calls.append(("val", tuple(keys)))
            yield self._batch(keys)

    cfg = Config(
        model=dataclasses.replace(
            MCFG, multistage_features=(4, 8, 8, 16, 16, 4)
        ),
        data=DataConfig(patch_size=PATCH, batch_size=2),
        train=TrainConfig(
            log_dir=str(tmp_path / "logs"),
            checkpoint_dir=str(tmp_path / "ckpts"),
            with_perceptual=False,
        ),
    )
    cohort_a, cohort_b = FakeData(PATCH), FakeData(PATCH)
    states, row = run_multistage(
        cohort_b, "pc-bssfp", config=cfg,
        epochs_per_stage={s: 1 for s in TrainingState},
        mesh=make_mesh(1), pretrain_data=cohort_a,
    )
    # PRETRAIN (autoencoder on DT) consumed cohort A only...
    assert cohort_a.calls == [
        ("train", ("dwi-tensor", "dwi-tensor")),
        ("val", ("dwi-tensor", "dwi-tensor")),
    ]
    # ...while TRANSFER + FINE_TUNE trained on the target cohort B.
    assert cohort_b.calls == [
        ("train", ("pc-bssfp", "dwi-tensor")),
        ("val", ("pc-bssfp", "dwi-tensor")),
    ] * 2
    assert len(states) == 3 and np.isfinite(row["val_loss"])
