"""GAN train step on an 8-device CPU mesh (SURVEY.md §4d): semantics,
determinism, loss behaviour, checkpoint round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.config import Config, ModelConfig, TrainConfig
from unet_bssfp_tpu.parallel.mesh import make_mesh, shard_batch
from unet_bssfp_tpu.train.state import build_models, create_gan_state
from unet_bssfp_tpu.train.steps import make_eval_step, make_predict_fn, make_train_step

MCFG = ModelConfig(
    features=(4, 8, 8, 16, 16, 4),
    disc_features=(8, 8, 16),  # 16³ patches → 2³ patch logits
    compute_dtype="float32",
)
TCFG = TrainConfig(lr=1e-3)
PATCH = 16
MODALITY = "pc-bssfp"


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(8)
    gen, disc = build_models(MODALITY, MCFG)
    state = create_gan_state(
        jax.random.PRNGKey(0), MODALITY, MCFG, TCFG, patch_size=PATCH
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, PATCH, PATCH, PATCH, 24)).astype(np.float32))
    y = jnp.asarray(rng.random((8, PATCH, PATCH, PATCH, 6)).astype(np.float32))
    return mesh, gen, disc, state, x, y


def test_train_step_runs_and_updates(setup):
    mesh, gen, disc, state, x, y = setup
    step = make_train_step(gen, disc, TCFG, mesh=mesh, donate=False)
    batch = shard_batch(mesh, {"x": x, "y": y})
    new_state, metrics = step(state, batch["x"], batch["y"])
    assert int(new_state.step) == 1
    for k in (
        "train_gen_loss",
        "train_gen_loss_adversarial",
        "train_gen_loss_recon",
        "train_gen_loss_recon_L1",
        "train_discr_loss",
    ):
        assert np.isfinite(float(metrics[k])), k
    # Both parameter trees changed.
    diff_gen = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.gen_params,
        new_state.gen_params,
    )
    assert max(jax.tree_util.tree_leaves(diff_gen)) > 0
    diff_disc = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.disc_params,
        new_state.disc_params,
    )
    assert max(jax.tree_util.tree_leaves(diff_disc)) > 0
    # BatchNorm stats advanced (train-mode forwards update buffers).
    bs_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.disc_batch_stats,
        new_state.disc_batch_stats,
    )
    assert max(jax.tree_util.tree_leaves(bs_diff)) > 0


@pytest.mark.slow  # compiles the step twice; determinism integration guard
def test_train_step_deterministic(setup):
    mesh, gen, disc, state, x, y = setup
    step = make_train_step(gen, disc, TCFG, mesh=mesh, donate=False)
    s1, m1 = step(state, x, y)
    s2, m2 = step(state, x, y)
    assert float(m1["train_gen_loss"]) == float(m2["train_gen_loss"])
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(s1.gen_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s2.gen_params)[0]),
    )


def test_sharded_matches_single_device(setup):
    """DP over 8 virtual devices computes the same loss and gradients as a
    single device (post-Adam params are NOT comparable: at step 1 the update
    is ~lr*sign(g), so reduction-order noise on near-zero grads flips
    signs)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, gen, disc, state, x, y = setup

    def gen_loss(gen_params, x, y):
        y_hat = gen.apply(
            {"params": gen_params, "batch_stats": state.gen_batch_stats},
            x, train=False,
        )
        return jnp.mean(jnp.abs(y_hat - y))

    grad_fn = jax.value_and_grad(gen_loss)
    repl = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P("data"))
    grad_mesh = jax.jit(grad_fn, in_shardings=(repl, bshard, bshard))
    grad_plain = jax.jit(grad_fn)

    l_mesh, g_mesh = grad_mesh(state.gen_params, x, y)
    l_plain, g_plain = grad_plain(state.gen_params, x, y)
    assert float(l_mesh) == pytest.approx(float(l_plain), rel=1e-5)
    leaves_mesh = jax.tree_util.tree_leaves(g_mesh)
    leaves_plain = jax.tree_util.tree_leaves(g_plain)
    # Tolerance relative to the global gradient magnitude: per-leaf scaling
    # would amplify reduction-order noise on near-zero-grad leaves.
    gscale = max(float(np.abs(np.asarray(b)).max()) for b in leaves_plain)
    for a, b in zip(leaves_mesh, leaves_plain):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3 * gscale
        )


@pytest.mark.slow  # multi-step training dynamics
def test_l1_only_loss_decreases_autoencoder():
    """Tiny autoencoder sanity: recon loss drops over a few steps."""
    mcfg = dataclasses.replace(MCFG, features=(4, 4, 8, 8, 8, 4))
    gen, disc = build_models("dwi-tensor", mcfg)
    state = create_gan_state(
        jax.random.PRNGKey(1), "dwi-tensor", mcfg, TCFG, patch_size=PATCH
    )
    step = make_train_step(gen, disc, TCFG, donate=False)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.random((4, PATCH, PATCH, PATCH, 6)).astype(np.float32))
    losses = []
    for _ in range(8):
        state, metrics = step(state, y, y)
        losses.append(float(metrics["train_gen_loss_recon_L1"]))
    assert losses[-1] < losses[0]


def test_eval_step_and_predict(setup):
    mesh, gen, disc, state, x, y = setup
    eval_step = make_eval_step(gen, disc, TCFG, mesh=mesh)
    metrics, y_hat = eval_step(state, x, y)
    assert y_hat.shape == y.shape
    for k in ("val_loss", "val_gen_loss_recon", "val_metric_PSNR",
              "val_metric_SSIM", "val_metric_L1"):
        assert np.isfinite(float(metrics[k])), k
    # Eval is deterministic (no dropout, running stats).
    m2, y_hat2 = eval_step(state, x, y)
    np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(y_hat2))

    predict = make_predict_fn(gen, mesh=mesh)
    pred = predict(state, x)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(y_hat), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, setup):
    mesh, gen, disc, state, x, y = setup
    from unet_bssfp_tpu.train.checkpoint import CheckpointManager, load_checkpoint

    mgr = CheckpointManager(str(tmp_path / "ckpts"), monitor="val_loss",
                            top_k=2)
    mgr.save(0, state, {"val_loss": 1.0})
    mgr.save(1, state, {"val_loss": 0.5})
    mgr.save(2, state, {"val_loss": 0.9})
    mgr.wait()
    assert mgr.best_step == 1
    restored = mgr.restore(state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.gen_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]),
    )
    best = load_checkpoint(mgr.best_path(), state)
    assert int(best.step) == int(state.step)
    mgr.close()


def test_checkpoint_embeds_config(tmp_path, setup):
    """Hyperparameter embedding (save_hyperparameters equivalent): the config
    rides with the checkpoint dir and is recoverable from a step path."""
    from unet_bssfp_tpu.config import Config
    from unet_bssfp_tpu.train.checkpoint import (
        CheckpointManager,
        load_config_for_checkpoint,
    )

    mesh, gen, disc, state, x, y = setup
    cfg = Config()
    mgr = CheckpointManager(
        str(tmp_path / "ck"), monitor="val_loss", top_k=2,
        config_json=cfg.to_json(),
    )
    mgr.save(0, state, {"val_loss": 1.0})
    mgr.wait()
    raw = load_config_for_checkpoint(mgr.best_path())
    assert raw is not None
    restored = Config.from_json(raw)
    assert restored.data.patch_size == cfg.data.patch_size
    assert restored.train.lr == cfg.train.lr
    mgr.close()
