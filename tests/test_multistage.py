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
