"""shard_map DDP-parity mode: per-device BatchNorm moments, pmean'd grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.config import ModelConfig, TrainConfig
from unet_bssfp_tpu.parallel.mesh import make_mesh, shard_batch
from unet_bssfp_tpu.train.state import build_models, create_gan_state
from unet_bssfp_tpu.train.steps import make_train_step

pytestmark = pytest.mark.slow


MCFG = ModelConfig(
    features=(4, 8, 8, 16, 16, 4),
    disc_features=(8, 8, 16),
    compute_dtype="float32",
)
TCFG = TrainConfig()
PATCH = 16


def test_ddp_parity_step_runs_and_differs_from_global_bn():
    mesh = make_mesh(8)
    gen, disc = build_models("pc-bssfp", MCFG)
    state = create_gan_state(
        jax.random.PRNGKey(0), "pc-bssfp", MCFG, TCFG, patch_size=PATCH
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, PATCH, PATCH, PATCH, 24)).astype(np.float32))
    y = jnp.asarray(rng.random((8, PATCH, PATCH, PATCH, 6)).astype(np.float32))
    batch = shard_batch(mesh, {"x": x, "y": y})

    step_parity = make_train_step(
        gen, disc, TCFG, mesh=mesh, donate=False, ddp_parity=True
    )
    s_par, m_par = step_parity(state, batch["x"], batch["y"])
    assert int(s_par.step) == 1
    for k, v in m_par.items():
        assert np.isfinite(float(v)), k

    # Global-BN mode on the same batch: different BN moments → (slightly)
    # different losses. Both finite; they must NOT be bitwise identical.
    step_global = make_train_step(gen, disc, TCFG, mesh=mesh, donate=False)
    s_glob, m_glob = step_global(state, batch["x"], batch["y"])
    assert float(m_par["train_discr_loss"]) != float(
        m_glob["train_discr_loss"]
    )

    # State stays replicated (pmean'd): batch stats finite and synced.
    bs = jax.tree_util.tree_leaves(s_par.disc_batch_stats)
    assert all(bool(jnp.isfinite(b).all()) for b in bs)


def test_ddp_parity_requires_mesh():
    gen, disc = build_models("pc-bssfp", MCFG)
    with pytest.raises(ValueError):
        make_train_step(gen, disc, TCFG, mesh=None, ddp_parity=True)
