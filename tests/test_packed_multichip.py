"""Multi-chip support for the Pallas spatial-lane conv (VERDICT r2 #2).

The kernel is an opaque custom call that GSPMD cannot partition; under a
>1-device mesh it is shard_mapped over the ``data`` axis by the
``packed_conv_mesh`` trace context (``ops.pallas.conv3d``) — the TPU-native
version of the reference's DDP contract (``/root/reference/src/train.py:30-32``).
These tests run the kernel in interpret mode on the 8-virtual-device CPU
mesh and assert packed-mesh == plain-XLA numerics for forward, gradients,
and the full jitted GAN train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.ops.pallas.conv3d import (
    conv3x3_packed_auto,
    pack_hw,
    packed_conv_mesh,
    unpack_hw,
)
from unet_bssfp_tpu.parallel.mesh import make_mesh


def _mk(shape, key, scale=0.3):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             jnp.float32) * scale


def _plain_conv(x, w, bias):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + bias


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provision 8 CPU devices"
    return make_mesh(8)


def test_conv_auto_sharded_matches_plain(mesh):
    B, D, H, W, CIN, COUT = 8, 4, 4, 32, 3, 4
    x = _mk((B, D, H, W, CIN), 0)
    w = _mk((3, 3, 3, CIN, COUT), 1)
    bias = _mk((COUT,), 2)
    xk = pack_hw(x)
    with packed_conv_mesh(mesh, "data"):
        got = conv3x3_packed_auto(xk, w, bias, W, True)
    ref = pack_hw(_plain_conv(x, w, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_auto_grads_match_plain(mesh):
    """The shard_map transpose must psum the replicated weight/bias
    cotangents across the data axis — otherwise dw/db come back 1/n."""
    B, D, H, W, CIN, COUT = 8, 4, 4, 32, 3, 4
    x = _mk((B, D, H, W, CIN), 3)
    w = _mk((3, 3, 3, CIN, COUT), 4)
    bias = _mk((COUT,), 5)

    def loss_sharded(x_, w_, b_):
        xk = pack_hw(x_)
        with packed_conv_mesh(mesh, "data"):
            y = conv3x3_packed_auto(xk, w_, b_, W, True)
        return jnp.sum(y * y)

    def loss_plain(x_, w_, b_):
        y = pack_hw(_plain_conv(x_, w_, b_))
        return jnp.sum(y * y)

    g_got = jax.grad(loss_sharded, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_plain, argnums=(0, 1, 2))(x, w, bias)
    for a, b, name in zip(g_got, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_conv_auto_falls_back_when_indivisible(mesh):
    # batch 6 does not divide 8 devices → plain kernel, same numerics.
    B, D, H, W, CIN, COUT = 6, 4, 4, 32, 3, 4
    x = _mk((B, D, H, W, CIN), 6)
    w = _mk((3, 3, 3, CIN, COUT), 7)
    bias = _mk((COUT,), 8)
    xk = pack_hw(x)
    with packed_conv_mesh(mesh, "data"):
        got = conv3x3_packed_auto(xk, w, bias, W, True)
    ref = pack_hw(_plain_conv(x, w, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # dp-only mesh; the dp*sp variant below stays fast and covers both axes
def test_packed_unet_on_mesh_matches_plain(mesh):
    """BasicUNet3D(packed=True) applied under the mesh context inside a
    sharded jit == the plain model on the same params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unet_bssfp_tpu.models.unet import BasicUNet3D

    x = _mk((8, 8, 8, 16, 3), 20)
    kw = dict(out_channels=2, features=(4, 4, 4, 4, 8, 4), dropout=0.0,
              dtype=jnp.float32, use_fused=False)
    plain = BasicUNet3D(packed=False, **kw)
    packed = BasicUNet3D(packed=True, **kw)
    params = plain.init(jax.random.PRNGKey(21), x, train=False)

    bshard = NamedSharding(mesh, P("data"))

    @jax.jit
    def apply_packed(p, x_):
        from unet_bssfp_tpu.ops.pallas.conv3d import packed_conv_mesh as ctx

        with ctx(mesh, "data"):
            return packed.apply(p, x_, train=False)

    xs = jax.device_put(x, bshard)
    got = apply_packed(params, xs)
    ref = plain.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_gan_train_step_packed_on_mesh():
    """The full jitted GAN step with a packed generator over the 8-device
    mesh matches the plain-model step (same state, same batch)."""
    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.parallel.mesh import shard_batch
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    mesh = make_mesh(8)
    mcfg_packed = ModelConfig(
        features=(4, 4, 4, 4, 8, 4), disc_features=(4, 8),
        dropout=0.0, compute_dtype="float32", packed=True, folded=False,
    )
    mcfg_plain = ModelConfig(
        features=(4, 4, 4, 4, 8, 4), disc_features=(4, 8),
        dropout=0.0, compute_dtype="float32", packed=False, folded=False,
    )
    tcfg = TrainConfig(rng_impl="")
    state = create_gan_state(
        jax.random.PRNGKey(0), "dwi-tensor", mcfg_plain, tcfg,
        patch_size=16,
    )
    x = _mk((8, 16, 16, 16, 6), 30)
    y = _mk((8, 16, 16, 16, 6), 31)

    gen_p, disc_p = build_models("dwi-tensor", mcfg_packed, mesh=mesh)
    step_packed = make_train_step(gen_p, disc_p, tcfg, mesh=mesh,
                                  donate=False)
    gen_q, disc_q = build_models("dwi-tensor", mcfg_plain)
    step_plain = make_train_step(gen_q, disc_q, tcfg, donate=False)

    xb = shard_batch(mesh, x)
    yb = shard_batch(mesh, y)
    s1, m1 = step_packed(state, xb, yb)
    s2, m2 = step_plain(state, x, y)
    for k in m2:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=5e-4, atol=5e-5, err_msg=k
        )
    # parameters after the update agree too (same AdamW trajectory).
    # Bias leaves feeding a norm have an exactly-zero true gradient; what
    # autodiff returns there is cancellation noise, and AdamW's first update
    # is ±lr·sign(noise) — so those leaves only admit an absolute bound of
    # ~2·lr (see tests/test_pallas_conv3d.py::test_packed_unet_grad_parity).
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.gen_params),
        jax.tree_util.tree_leaves_with_path(s2.gen_params),
    ):
        key = jax.tree_util.keystr(kp)
        atol = 2.5e-3 if key.endswith("['bias']") else 5e-4
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=atol,
            err_msg=key,
        )


def test_auto_packed_gate_mesh_aware():
    """ADVICE r2: the packed auto-gate keys on the intended mesh, not the
    global device count."""
    from unet_bssfp_tpu.config import ModelConfig
    from unet_bssfp_tpu.train.state import auto_packed

    mcfg_auto = ModelConfig()
    # explicit setting always wins
    assert auto_packed(ModelConfig(packed=True), None) is True
    assert auto_packed(ModelConfig(packed=False), None) is False
    # CPU backend: auto is off regardless of mesh
    assert auto_packed(mcfg_auto, make_mesh(8)) is False
    assert auto_packed(
        mcfg_auto, make_mesh(8, axes=("data", "space"), shape=(4, 2))
    ) is False


# ---------------------------------------------------------------------------
# space-axis (d-sharded) packed conv with ppermute halo exchange
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mesh_dp_sp():
    return make_mesh(8, axes=("data", "space"), shape=(4, 2))


def test_conv_space_sharded_matches_plain(mesh_dp_sp):
    """d sharded over the space axis: halo slices come from the neighbour
    shard via ppermute, so the result must equal the unsharded conv —
    including at shard-boundary d positions."""
    B, D, H, W, CIN, COUT = 8, 8, 4, 32, 3, 4
    x = _mk((B, D, H, W, CIN), 40)
    w = _mk((3, 3, 3, CIN, COUT), 41)
    bias = _mk((COUT,), 42)
    xk = pack_hw(x)
    with packed_conv_mesh(mesh_dp_sp, "data", space_axis="space"):
        got = conv3x3_packed_auto(xk, w, bias, W, True)
    ref = pack_hw(_plain_conv(x, w, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_space_sharded_grads_match_plain(mesh_dp_sp):
    """Reverse-mode through the halo exchange: ppermute transposes to the
    reverse permutation and dw/db psum over both axes."""
    B, D, H, W, CIN, COUT = 8, 8, 4, 32, 3, 4
    x = _mk((B, D, H, W, CIN), 43)
    w = _mk((3, 3, 3, CIN, COUT), 44)
    bias = _mk((COUT,), 45)

    def loss_sharded(x_, w_, b_):
        xk = pack_hw(x_)
        with packed_conv_mesh(mesh_dp_sp, "data", space_axis="space"):
            y = conv3x3_packed_auto(xk, w_, b_, W, True)
        return jnp.sum(y * y)

    def loss_plain(x_, w_, b_):
        y = pack_hw(_plain_conv(x_, w_, b_))
        return jnp.sum(y * y)

    g_got = jax.grad(loss_sharded, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_plain, argnums=(0, 1, 2))(x, w, bias)
    for a, b, name in zip(g_got, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=name,
        )


def test_conv_space_indivisible_falls_back(mesh_dp_sp):
    # D=6 does not divide the 2-way space axis → data-only shard_map.
    B, D, H, W, CIN, COUT = 8, 6, 4, 32, 3, 4
    x = _mk((B, D, H, W, CIN), 46)
    w = _mk((3, 3, 3, CIN, COUT), 47)
    bias = _mk((COUT,), 48)
    xk = pack_hw(x)
    with packed_conv_mesh(mesh_dp_sp, "data", space_axis="space"):
        got = conv3x3_packed_auto(xk, w, bias, W, True)
    ref = pack_hw(_plain_conv(x, w, bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_unet_on_dp_sp_mesh_matches_plain(mesh_dp_sp):
    """Whole packed U-Net under a ('data','space') mesh: convs halo-exchange
    over space, pools/norms repartition under GSPMD — output equals the
    plain model."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unet_bssfp_tpu.models.unet import BasicUNet3D

    x = _mk((4, 16, 8, 16, 3), 50)
    kw = dict(out_channels=2, features=(4, 4, 4, 4, 8, 4), dropout=0.0,
              dtype=jnp.float32, use_fused=False)
    plain = BasicUNet3D(packed=False, **kw)
    packed = BasicUNet3D(packed=True, **kw)
    params = plain.init(jax.random.PRNGKey(51), x, train=False)

    bshard = NamedSharding(mesh_dp_sp, P("data", "space"))

    @jax.jit
    def apply_packed(p, x_):
        from unet_bssfp_tpu.ops.pallas.conv3d import packed_conv_mesh as ctx

        with ctx(mesh_dp_sp, "data", space_axis="space"):
            return packed.apply(p, x_, train=False)

    xs = jax.device_put(x, bshard)
    got = apply_packed(params, xs)
    ref = plain.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
