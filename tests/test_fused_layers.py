"""Fused InstanceNorm+LeakyReLU wiring: model-path equivalence + gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from unet_bssfp_tpu.models.layers import ConvNormAct, InstanceNorm
from unet_bssfp_tpu.ops.pallas.fused_norm_act import (
    fused_instance_norm_leaky_relu_vjp,
    instance_norm_leaky_relu_reference,
)


def test_fused_flag_same_params_and_output_off_tpu(rng):
    """On CPU the fused flag routes to the reference math — outputs and the
    parameter tree must be identical with/without the flag."""
    x = jnp.asarray(rng.random((2, 8, 8, 8, 6)).astype(np.float32))
    m_fused = ConvNormAct(8, dropout=0.0, use_fused=True)
    m_plain = ConvNormAct(8, dropout=0.0, use_fused=False)
    v1 = m_fused.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m_plain.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    y1 = m_fused.apply(v1, x, train=False)
    y2 = m_plain.apply(v1, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_fused_train_with_dropout_commutes(rng):
    """Fused path applies dropout after the activation; LeakyReLU's positive
    homogeneity makes this identical to the ADN ordering up to rounding."""
    x = jnp.asarray(rng.random((2, 8, 8, 8, 6)).astype(np.float32))
    m_fused = ConvNormAct(8, dropout=0.5, use_fused=True)
    m_plain = ConvNormAct(8, dropout=0.5, use_fused=False)
    v = m_fused.init(jax.random.PRNGKey(0), x, train=False)
    y1 = m_fused.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)})
    y2 = m_plain.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    # Dropout actually active in both (same mask, ~half zeros).
    zeros = (np.asarray(y1) == 0).mean()
    assert 0.3 < zeros < 0.7


def test_fused_vjp_gradients_match_reference(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 8)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(fused_instance_norm_leaky_relu_vjp(x, s, b, 0.1) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(
            instance_norm_leaky_relu_reference(x, s, b, 0.1) ** 2
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_instance_norm_fused_slope_relu(rng):
    """fused_slope=0.0 gives ReLU semantics (for ResNetHead fusion)."""
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32))
    m = InstanceNorm(fused_slope=0.0)
    v = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(v, x))
    assert (y >= 0).all()
