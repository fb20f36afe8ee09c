"""Shifted-s2d k4s2 folded conv (ops.folded.conv_k4s2_folded) and the
discriminator's folded path: identical params, identical outputs.

Reference contract: the PatchGAN DownSampleConv chain at
/root/reference/src/model.py:42-92 — the folded form is the TPU-first
re-formulation (same FLOPs, full MXU reduction lanes at small Cin).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.ops.folded import conv_k4s2_folded


def _plain_k4s2(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y if b is None else y + b


def _mk(shape, seed, scale=1.0):
    return scale * jax.random.normal(
        jax.random.PRNGKey(seed), shape, jnp.float32
    )


@pytest.mark.parametrize("cin,cout", [(3, 8), (30, 32), (8, 16)])
def test_conv_k4s2_folded_matches_plain(cin, cout):
    x = _mk((2, 8, 8, 12, cin), 1)
    w = _mk((4, 4, 4, cin, cout), 2, 0.05)
    b = _mk((cout,), 3)
    got = conv_k4s2_folded(x, w, b)
    ref = _plain_k4s2(x, w, b)
    assert got.shape == ref.shape == (2, 4, 4, 6, cout)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_conv_k4s2_folded_grads_match_plain():
    x = _mk((2, 8, 8, 8, 4), 4)
    w = _mk((4, 4, 4, 4, 8), 5, 0.05)
    b = _mk((8,), 6)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g_got = jax.grad(loss(conv_k4s2_folded), argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss(_plain_k4s2), argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(g_got, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=3e-4, atol=3e-4,
            err_msg=name,
        )


def test_discriminator_folded_matches_plain():
    """Same param tree → same logits: the folded flag changes only the
    compute formulation."""
    from unet_bssfp_tpu.models.discriminator import Discriminator

    kw = dict(modality="pc-bssfp", features=(8, 8, 16),
              dtype=jnp.float32)
    plain = Discriminator(folded=False, **kw)
    folded = Discriminator(folded=True, **kw)
    x = _mk((2, 16, 16, 16, 24), 7)
    y = _mk((2, 16, 16, 16, 6), 8)
    params = plain.init(jax.random.PRNGKey(9), x, y, train=False)
    jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape, params,
            folded.init(jax.random.PRNGKey(9), x, y, train=False),
        )
    )
    out_p = plain.apply(params, x, y, train=False)
    out_f = folded.apply(params, x, y, train=False)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=2e-4, atol=2e-4
    )


def test_convblock_folded_odd_dims_falls_back():
    """Odd spatial extents cannot fold: the block must still compute the
    plain conv (identical result, no shape error)."""
    from unet_bssfp_tpu.models.layers import ConvBlock

    x = _mk((1, 6, 6, 7, 4), 10)   # odd W
    blk_p = ConvBlock(8, batchnorm=False, folded=False, dtype=jnp.float32)
    blk_f = ConvBlock(8, batchnorm=False, folded=True, dtype=jnp.float32)
    params = blk_p.init(jax.random.PRNGKey(11), x, False)
    out_p = blk_p.apply(params, x, False)
    out_f = blk_f.apply(params, x, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p))


def test_disc_folded_config_plumbs_through():
    from unet_bssfp_tpu.config import ModelConfig
    from unet_bssfp_tpu.train.state import build_models

    mcfg = ModelConfig(features=(4, 8, 8, 16, 16, 4),
                       disc_features=(8, 8, 16), disc_folded=True)
    _, disc = build_models("pc-bssfp", mcfg)
    assert disc.folded is True
    mcfg2 = ModelConfig(features=(4, 8, 8, 16, 16, 4),
                        disc_features=(8, 8, 16))
    _, disc2 = build_models("pc-bssfp", mcfg2)
    # auto = False: measured slower than XLA's plain k4s2 on v5e
    # (scripts/disc_conv_probe.py, round 3)
    assert disc2.folded is False
