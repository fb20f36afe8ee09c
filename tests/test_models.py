"""Model shape/dtype/param-structure golden tests (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.models import (
    BasicUNet3D,
    Discriminator,
    Generator,
    MedicalNetResNet10,
    MultiInputUNet,
    TrainingState,
)
from unet_bssfp_tpu.models.multi_input_unet import trainable_mask, stage_lr

SMALL_FEATURES = (8, 16, 32, 32, 64, 8)


def _init(module, *args, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return module.init(rngs, *args, train=train)


def test_unet_shapes():
    # eval_shape: full shape propagation without an XLA compile (the
    # odd-shape test below runs the real thing).
    net = BasicUNet3D(out_channels=6, features=SMALL_FEATURES)
    x = jnp.zeros((1, 16, 16, 16, 24))
    variables = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), x, train=False))
    y = jax.eval_shape(
        lambda v: net.apply(v, x, train=False), variables)
    assert y.shape == (1, 16, 16, 16, 6)


def test_unet_odd_shape_pads():
    # 5 levels need /16 divisibility; odd dims exercise UpCat padding.
    net = BasicUNet3D(out_channels=2, features=SMALL_FEATURES)
    x = jnp.zeros((1, 20, 24, 20, 4))
    variables = _init(net, x)
    y = net.apply(variables, x, train=False)
    assert y.shape == (1, 20, 24, 20, 2)


@pytest.mark.parametrize("modality,chans", [("pc-bssfp", 24), ("dwi-tensor", 6)])
def test_generator_shapes(modality, chans):
    gen = Generator(modality=modality, features=SMALL_FEATURES)
    x = jnp.zeros((2, 16, 16, 16, chans))
    variables = _init(gen, x)
    y = gen.apply(variables, x, train=False)
    assert y.shape == (2, 16, 16, 16, 6)


def test_generator_head_sharing_names():
    """dwi-tensor/t1w share the 'head6' subtree; pc-bssfp/bssfp 'head24'
    (reference src/model.py:29-34)."""
    v_dwi = _init(Generator(modality="dwi-tensor", features=SMALL_FEATURES),
                  jnp.zeros((1, 16, 16, 16, 6)))
    v_t1w = _init(Generator(modality="t1w", features=SMALL_FEATURES),
                  jnp.zeros((1, 16, 16, 16, 6)))
    assert "head6" in v_dwi["params"] and "head6" in v_t1w["params"]
    v_pc = _init(Generator(modality="pc-bssfp", features=SMALL_FEATURES),
                 jnp.zeros((1, 16, 16, 16, 24)))
    assert "head24" in v_pc["params"]
    # Parameter trees are restore-compatible across the group.
    assert jax.tree_util.tree_structure(
        v_dwi["params"]
    ) == jax.tree_util.tree_structure(v_t1w["params"])


def test_generator_dropout_active_in_train():
    gen = Generator(modality="dwi-tensor", features=SMALL_FEATURES, dropout=0.5)
    x = jnp.ones((1, 16, 16, 16, 6))
    variables = _init(gen, x)
    y1, _ = gen.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    y2, _ = gen.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # Deterministic in eval.
    y3 = gen.apply(variables, x, train=False)
    y4 = gen.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y4))


def test_discriminator_patch_logits():
    """64³ in → 2³ patch logit map (reference src/model.py:79-83 ladder);
    here 32³ → 1³ with the same ladder depth."""
    disc = Discriminator(modality="pc-bssfp", features=(8, 8, 16, 16, 32))
    x = jnp.zeros((1, 32, 32, 32, 24))
    y = jnp.zeros((1, 32, 32, 32, 6))
    variables = _init(disc, x, y)
    logits, _ = disc.apply(
        variables, x, y, train=True, mutable=["batch_stats"]
    )
    assert logits.shape == (1, 1, 1, 1, 1)
    # First block channel check: concat 24+6=30 input channels.
    d1 = variables["params"]["d1_head24"]["conv"]["kernel"]
    assert d1.shape[3] == 30


def test_discriminator_dwi_first_block():
    disc = Discriminator(modality="dwi-tensor", features=(8, 8, 16, 16, 32))
    x = jnp.zeros((1, 32, 32, 32, 6))
    y = jnp.zeros((1, 32, 32, 32, 6))
    variables = _init(disc, x, y)
    d1 = variables["params"]["d1_head6"]["conv"]["kernel"]
    assert d1.shape[3] == 12  # 6+6 (reference src/model.py:73)


def test_generator_param_count_full_size():
    """Full-size generator parameter count is in the reference ballpark
    (MONAI BasicUNet(24→6, (32,64,128,256,512,32)) ≈ 19.7M params + head)."""
    gen = Generator(modality="pc-bssfp")
    x = jnp.zeros((1, 16, 16, 16, 24))
    # eval_shape: param shapes without materialising 20M weights.
    variables = jax.eval_shape(
        lambda: gen.init(jax.random.PRNGKey(0), x, train=False))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
        variables["params"]))
    assert 15e6 < n < 25e6, f"param count {n}"


def test_medicalnet_feature_shapes():
    net = MedicalNetResNet10()
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    feats = net.apply(variables, x, train=False)
    # stem /2, maxpool /2, layer2 /2 → 32/8 = 4; 512 channels.
    assert feats.shape == (1, 4, 4, 4, 512)


def test_multi_input_unet_and_stages():
    net = MultiInputUNet(modality="dwi-tensor", features=SMALL_FEATURES)
    x = jnp.zeros((1, 16, 16, 16, 6))
    variables = _init(net, x)
    y = net.apply(variables, x, train=False)
    assert y.shape == (1, 16, 16, 16, 6)

    mask = trainable_mask(variables["params"], TrainingState.TRANSFER)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    head_leaves = [v for p, v in leaves if "head" in str(p[0])]
    unet_leaves = [v for p, v in leaves if "unet" in str(p[0])]
    assert all(head_leaves) and head_leaves
    assert not any(unet_leaves) and unet_leaves

    mask_ft = trainable_mask(variables["params"], TrainingState.FINE_TUNE)
    assert all(jax.tree_util.tree_leaves(mask_ft))
    assert stage_lr(TrainingState.FINE_TUNE, 1e-3, 1e-5) == 1e-5
    assert stage_lr(TrainingState.PRETRAIN, 1e-3, 1e-5) == 1e-3


def test_unet_wpack_mid_param_compatible():
    """wpack_mid (w-packed mid-stage conv GEMMs, ops.packed_conv) is exact
    and checkpoint-compatible: the same param tree drives both variants to
    the same output (up to float reorder), and grads match."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 16, 16, 16, 24)).astype(np.float32))
    plain = BasicUNet3D(features=SMALL_FEATURES, dtype=jnp.float32)
    wpack = BasicUNet3D(
        features=SMALL_FEATURES, dtype=jnp.float32, wpack_mid=True
    )
    variables = _init(plain, x)
    ya = plain.apply(variables, x, train=False)
    yb = wpack.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(ya), np.asarray(yb), atol=2e-5, rtol=1e-4
    )

    def loss(net, v):
        return jnp.sum(net.apply(v, x, train=False) ** 2)

    ga = jax.grad(lambda v: loss(plain, v))(variables)
    gb = jax.grad(lambda v: loss(wpack, v))(variables)
    import flax

    fa = flax.traverse_util.flatten_dict(ga["params"])
    fb = flax.traverse_util.flatten_dict(gb["params"])
    # Scale for the cancellation-noise bound below: the largest real
    # (kernel) gradient magnitude in the tree.
    grad_scale = max(
        np.abs(np.asarray(v)).max()
        for k, v in fa.items() if k[-2:] != ("conv", "bias")
    )
    for k in fa:
        pa, pb = np.asarray(fa[k]), np.asarray(fb[k])
        if k[-2:] == ("conv", "bias"):
            # A conv bias followed by InstanceNorm has analytically-zero
            # gradient (the norm subtracts the mean); what remains is pure
            # cancellation noise whose magnitude depends on XLA's summation
            # order — which varies with fusion choices across test-session
            # compilation states. Bound it relative to the real gradients,
            # not absolutely.
            bound = 1e-3 * grad_scale
            assert np.abs(pa).max() < bound and np.abs(pb).max() < bound, (
                k, np.abs(pa).max(), np.abs(pb).max(), bound)
            continue
        np.testing.assert_allclose(
            pa, pb, atol=2e-3 * max(np.abs(pa).max(), 1e-3), rtol=5e-3,
            err_msg="/".join(k),
        )
