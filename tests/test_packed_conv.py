"""Numerics tests for the w-packed conv (ops/packed_conv.py).

The widened block-Toeplitz kernel is the same weights with structural zeros,
so forward and both VJP legs must agree with the plain XLA conv to float32
tolerance. Reference provenance: computes the 3×3×3 SAME convs of the MONAI
BasicUNet stages (/root/reference/src/model.py:22-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from unet_bssfp_tpu.ops.packed_conv import (
    PackedConv3x3,
    packed_conv3d,
    pick_pack,
)


def _plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def test_pick_pack():
    assert pick_pack(32, 64) == 4
    assert pick_pack(64, 64) == 2
    assert pick_pack(128, 64) == 1
    assert pick_pack(32, 6) == 2   # 6 % 4 != 0 but 6 % 2 == 0
    assert pick_pack(32, 7) == 1


@pytest.mark.parametrize("pack", [1, 2, 4])
def test_packed_forward_matches_plain(pack):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (2, 4, 6, 8, 3), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, 3, 5), jnp.float32) * 0.2
    got = packed_conv3d(x, w, pack)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_plain(x, w)), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pack", [2, 4])
def test_packed_vjp_matches_plain(pack):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (1, 4, 6, 8, 4), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, 4, 6), jnp.float32) * 0.2
    dy = jax.random.normal(k3, (1, 4, 6, 8, 6), jnp.float32)

    _, vjp_ref = jax.vjp(lambda x_, w_: _plain(x_, w_), x, w)
    dx_ref, dw_ref = vjp_ref(dy)
    _, vjp_got = jax.vjp(lambda x_, w_: packed_conv3d(x_, w_, pack), x, w)
    dx_got, dw_got = vjp_got(dy)
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


def test_packed_module_param_compat_with_nn_conv():
    """PackedConv3x3 params restore onto nn.Conv and vice versa."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 3),
                          jnp.float32)
    plain = nn.Conv(5, kernel_size=(3, 3, 3), padding=1)
    packed = PackedConv3x3(5)
    params = plain.init(jax.random.PRNGKey(3), x)
    ref = plain.apply(params, x)
    got = packed.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
