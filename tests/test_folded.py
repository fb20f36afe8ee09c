"""Numerics tests for the shifted space-to-depth ("folded") conv path.

The folded layout is exactly equivalent math (widened block-sparse kernels
whose zeros contribute zero; see ``ops/folded.py``), so every test here
asserts agreement with the plain NDHWC implementation to float tolerance
on the same weights. Reference provenance: these blocks compute the MONAI
BasicUNet stages of the reference generator (/root/reference/src/model.py:22-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from unet_bssfp_tpu.models.folded_layers import (
    FoldedTwoConv,
    FoldedUpCat,
)
from unet_bssfp_tpu.models.layers import TwoConv, UpCat
from unet_bssfp_tpu.ops.folded import (
    fold_cols,
    fold_conv_kernel,
    fold_hw,
    folded_concat,
    folded_conv3x3,
    folded_instance_norm_stats,
    folded_max_pool2,
    mask_pad_slots,
    pad_slot_mask,
    unfold_hw,
)

pytestmark = pytest.mark.slow


OFFSETS = [1, 0, -1, -2, -3]


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("off", OFFSETS)
@pytest.mark.parametrize("hw", [(8, 8), (8, 12), (16, 8)])
def test_fold_unfold_roundtrip(off, hw):
    h, w = hw
    x = _rand(jax.random.PRNGKey(0), (2, 4, h, w, 3))
    xf = fold_hw(x, off, off)
    _, nh = fold_cols(h, off)
    _, nw = fold_cols(w, off)
    assert xf.shape == (2, 4, nh, nw, 12)
    back = unfold_hw(xf, h, w, off, off)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("off", OFFSETS)
def test_fold_pad_slots_are_zero(off):
    h = w = 8
    x = jnp.ones((1, 2, h, w, 2))
    xf = fold_hw(x, off, off)
    # mask_pad_slots must be a no-op on a freshly folded tensor
    masked = mask_pad_slots(xf, h, w, off, off)
    np.testing.assert_array_equal(np.asarray(masked), np.asarray(xf))
    # and the analytic mask agrees with where fold_hw wrote real data
    _, nh = fold_cols(h, off)
    mh = pad_slot_mask(h, off, nh)
    got = np.asarray(xf).reshape(1, 2, nh, nh, 2, 2, 2)
    # reduce over (b, d, w-cols, jw, c): slot (col_h, jh) is real iff any
    # value is non-zero (input is all-ones)
    occupied_h = got.max(axis=(0, 1, 3, 5, 6))
    np.testing.assert_array_equal(occupied_h > 0, mh > 0)


@pytest.mark.parametrize("off", OFFSETS)
@pytest.mark.parametrize("cin,cout", [(3, 5), (4, 4)])
def test_folded_conv_matches_plain(off, cin, cout):
    h = w = 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = _rand(k1, (2, 4, h, w, cin))
    kern = _rand(k2, (3, 3, 3, cin, cout)) * 0.2

    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )

    xf = fold_hw(x, off, off)
    yf = folded_conv3x3(xf, kern, h, w, off)
    oo = off - 1
    yf = mask_pad_slots(yf, h, w, oo, oo)
    y = unfold_hw(yf, h, w, oo, oo)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("off", OFFSETS)
def test_folded_conv_chain_matches_plain(off):
    """Two chained folded convs with no intermediate unfold."""
    h = w = 8
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _rand(keys[0], (1, 4, h, w, 3))
    kern_a = _rand(keys[1], (3, 3, 3, 3, 4)) * 0.2
    kern_b = _rand(keys[2], (3, 3, 3, 4, 5)) * 0.2

    dn = ("NDHWC", "DHWIO", "NDHWC")
    ref = jax.lax.conv_general_dilated(x, kern_a, (1, 1, 1), "SAME",
                                       dimension_numbers=dn)
    ref = jax.lax.conv_general_dilated(ref, kern_b, (1, 1, 1), "SAME",
                                       dimension_numbers=dn)

    xf = fold_hw(x, off, off)
    yf = folded_conv3x3(xf, kern_a, h, w, off)
    yf = mask_pad_slots(yf, h, w, off - 1, off - 1)
    zf = folded_conv3x3(yf, kern_b, h, w, off - 1)
    zf = mask_pad_slots(zf, h, w, off - 2, off - 2)
    z = unfold_hw(zf, h, w, off - 2, off - 2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_conv_kernel_density():
    kern = jnp.ones((3, 3, 3, 2, 3))
    wf = fold_conv_kernel(kern)
    assert wf.shape == (3, 2, 2, 8, 12)
    # shifted fold: widened kernel is 9/16 dense along (h, w) taps
    frac = float(jnp.mean((wf != 0).astype(jnp.float32)))
    np.testing.assert_allclose(frac, 9.0 / 16.0, atol=1e-6)


@pytest.mark.parametrize("off", OFFSETS)
def test_folded_max_pool(off):
    h = w = 8
    x = _rand(jax.random.PRNGKey(3), (2, 4, h, w, 3))
    ref = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
    xf = fold_hw(x, off, off)
    got = folded_max_pool2(xf, h, w, off)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("off", [0, -1])
def test_folded_concat(off):
    h = w = 8
    ka, kb = jax.random.split(jax.random.PRNGKey(4))
    a = _rand(ka, (1, 2, h, w, 3))
    b = _rand(kb, (1, 2, h, w, 5))
    cf = folded_concat(fold_hw(a, off, off), fold_hw(b, off, off))
    got = unfold_hw(cf, h, w, off, off)
    ref = jnp.concatenate([a, b], axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("off", [1, 0, -1])
def test_folded_instance_norm_stats(off):
    h = w = 8
    x = _rand(jax.random.PRNGKey(5), (2, 4, h, w, 3))
    xf = fold_hw(x, off, off)
    mean4, var4 = folded_instance_norm_stats(xf, count=4 * h * w)
    ref_mean = jnp.mean(x, axis=(1, 2, 3))          # (b, c)
    ref_var = jnp.var(x, axis=(1, 2, 3))
    got_mean = np.asarray(mean4).reshape(2, 4, 3)[:, 0, :]
    got_var = np.asarray(var4).reshape(2, 4, 3)[:, 0, :]
    np.testing.assert_allclose(got_mean, np.asarray(ref_mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_var, np.asarray(ref_var),
                               rtol=1e-5, atol=1e-6)


def _match_param_trees(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves_with_path(b)
    pa = {jax.tree_util.keystr(k): v.shape for k, v in fa}
    pb = {jax.tree_util.keystr(k): v.shape for k, v in fb}
    assert pa == pb, f"param trees differ:\n{pa}\nvs\n{pb}"


@pytest.mark.parametrize("start_off", [1, 0])
def test_folded_two_conv_matches_two_conv(start_off):
    h = w = 8
    x = _rand(jax.random.PRNGKey(6), (2, 4, h, w, 5))
    plain = TwoConv(features=4, dropout=0.0, use_fused=False,
                    dtype=jnp.float32)
    folded = FoldedTwoConv(features=4, dropout=0.0, dtype=jnp.float32,
                           start_off=start_off)
    params = plain.init(jax.random.PRNGKey(7), x, train=False)
    _match_param_trees(params, folded.init(jax.random.PRNGKey(8), x,
                                           train=False))
    ref = plain.apply(params, x, train=False)
    got_f = folded.apply(params, x, train=False)
    got = unfold_hw(got_f, h, w, start_off - 2, start_off - 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("skip_off", [-1, -2])
def test_folded_upcat_matches_upcat(skip_off):
    h = w = 8
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    x = _rand(keys[0], (1, 2, h // 2, w // 2, 6))
    skip = _rand(keys[1], (1, 4, h, w, 4))
    plain = UpCat(features=4, up_features=6, dropout=0.0,
                  use_fused=False, dtype=jnp.float32)
    folded = FoldedUpCat(features=4, up_features=6, h=h, w=w,
                         skip_off=skip_off, dropout=0.0, dtype=jnp.float32)
    params = plain.init(keys[2], x, skip, train=False)
    skip_f = fold_hw(skip, skip_off, skip_off)
    _match_param_trees(
        params, folded.init(keys[2], x, skip_f, train=False))
    ref = plain.apply(params, x, skip, train=False)
    got = folded.apply(params, x, skip_f, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_folded_unet_matches_plain():
    """Full BasicUNet3D: folded=True output == folded=False output on the
    same params (checkpoint interchangeability), in float32."""
    from unet_bssfp_tpu.models.unet import BasicUNet3D

    x = _rand(jax.random.PRNGKey(12), (1, 16, 16, 16, 5))
    kw = dict(out_channels=2, features=(4, 4, 4, 4, 8, 4), dropout=0.0,
              dtype=jnp.float32, use_fused=False)
    plain = BasicUNet3D(folded=False, **kw)
    folded = BasicUNet3D(folded=True, **kw)
    params = plain.init(jax.random.PRNGKey(13), x, train=False)
    _match_param_trees(params,
                       folded.init(jax.random.PRNGKey(14), x, train=False))
    ref = plain.apply(params, x, train=False)
    got = folded.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_folded_unet_falls_back_on_odd_dims():
    from unet_bssfp_tpu.models.unet import BasicUNet3D

    # odd W: the folded model must transparently use the plain path
    x = _rand(jax.random.PRNGKey(15), (1, 16, 16, 17, 3))
    kw = dict(out_channels=2, features=(4, 4, 4, 4, 8, 4), dropout=0.0,
              dtype=jnp.float32, use_fused=False)
    folded = BasicUNet3D(folded=True, **kw)
    params = folded.init(jax.random.PRNGKey(16), x, train=False)
    y = folded.apply(params, x, train=False)
    assert y.shape == (1, 16, 16, 17, 2)


def test_folded_two_conv_grad_parity():
    """Autodiff through the folded path gives the same parameter grads."""
    h = w = 8
    x = _rand(jax.random.PRNGKey(10), (1, 4, h, w, 3))
    plain = TwoConv(features=4, dropout=0.0, use_fused=False,
                    dtype=jnp.float32)
    folded = FoldedTwoConv(features=4, dropout=0.0, dtype=jnp.float32,
                           start_off=0)
    params = plain.init(jax.random.PRNGKey(11), x, train=False)

    def loss_plain(p):
        y = plain.apply(p, x, train=False)
        return jnp.sum(y * y)

    def loss_folded(p):
        yf = folded.apply(p, x, train=False)
        y = unfold_hw(yf, h, w, -2, -2)
        return jnp.sum(y * y)

    g_ref = jax.grad(loss_plain)(params)
    g_got = jax.grad(loss_folded)(params)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_got),
    ):
        key = jax.tree_util.keystr(kp)
        # A conv bias followed by InstanceNorm has an exactly-zero true
        # gradient (the norm subtracts it); autodiff returns cancellation
        # noise there, so only an absolute bound is meaningful.
        atol = 2e-2 if key.endswith("['conv']['bias']") else 2e-4
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=atol,
            err_msg=key)
