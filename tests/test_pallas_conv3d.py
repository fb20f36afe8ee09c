"""Correctness of the Pallas packed-w-major 3×3×3 conv (interpret mode, CPU).

Forward, dx, dw and db must match the XLA NDHWC conv and its autodiff to
float32 tolerance, across the packing factors P = 128/W the kernel supports.
Reference provenance: these compute the BasicUNet stage convs of the
reference generator (/root/reference/src/model.py:22-28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.ops.pallas.conv3d import (
    conv3x3_packed,
    conv3x3_reference_packed,
    pack_hw,
    packed_supported,
    unpack_hw,
)


def _mk(shape, key, scale=0.3):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             jnp.float32) * scale


# NDHWC (B, D, H, W, C): covers P = 128/W ∈ {2, 4} with several h-columns.
SHAPES = [
    (1, 4, 8, 64, 3),
    (2, 4, 6, 64, 5),
    (1, 4, 12, 32, 8),
    (1, 3, 4, 128, 3),   # P = 1
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(shape):
    B, D, H, W, CIN = shape
    COUT = 4
    x = _mk(shape, 0)
    w = _mk((3, 3, 3, CIN, COUT), 1)
    bias = _mk((COUT,), 2)
    xk = pack_hw(x)
    got = conv3x3_packed(xk, w, bias, W, True)
    ref = conv3x3_reference_packed(xk, w, bias, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and unpacking gives the plain conv
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    np.testing.assert_allclose(np.asarray(unpack_hw(got, W)),
                               np.asarray(y), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES[:2])
def test_vjp_matches_xla(shape):
    B, D, H, W, CIN = shape
    COUT = 4
    x = _mk(shape, 6)
    w = _mk((3, 3, 3, CIN, COUT), 7)
    bias = _mk((COUT,), 8)
    xk = pack_hw(x)
    dy = pack_hw(_mk((B, D, H, W, COUT), 9))

    _, vjp_ref = jax.vjp(
        lambda x_, w_, b_: conv3x3_reference_packed(x_, w_, b_, W),
        xk, w, bias)
    dx_r, dw_r, db_r = vjp_ref(dy)
    _, vjp_got = jax.vjp(
        lambda x_, w_, b_: conv3x3_packed(x_, w_, b_, W, True),
        xk, w, bias)
    dx_g, dw_g, db_g = vjp_got(dy)
    np.testing.assert_allclose(np.asarray(dx_g), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_g), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_g), np.asarray(db_r),
                               rtol=1e-4, atol=1e-4)


def test_packed_unet_matches_plain():
    """BasicUNet3D(packed=True) output == plain output on the same params
    (checkpoint interchangeability), float32, interpret-mode kernel."""
    from unet_bssfp_tpu.models.unet import BasicUNet3D

    x = _mk((1, 16, 16, 16, 5), 12)
    kw = dict(out_channels=2, features=(4, 4, 4, 4, 8, 4), dropout=0.0,
              dtype=jnp.float32, use_fused=False)
    plain = BasicUNet3D(packed=False, **kw)
    packed = BasicUNet3D(packed=True, **kw)
    params = plain.init(jax.random.PRNGKey(13), x, train=False)
    p2 = packed.init(jax.random.PRNGKey(14), x, train=False)
    fa = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(params)}
    fb = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(p2)}
    assert fa == fb, f"param trees differ:\n{fa}\nvs\n{fb}"
    ref = plain.apply(params, x, train=False)
    got = packed.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow  # model-level grad parity; kernel VJPs stay in the fast tier
def test_packed_unet_grad_parity():
    from unet_bssfp_tpu.models.unet import BasicUNet3D

    x = _mk((1, 8, 8, 16, 3), 15)
    kw = dict(out_channels=2, features=(4, 4, 4, 4, 8, 4), dropout=0.0,
              dtype=jnp.float32, use_fused=False)
    plain = BasicUNet3D(packed=False, **kw)
    packed = BasicUNet3D(packed=True, **kw)
    params = plain.init(jax.random.PRNGKey(16), x, train=False)

    g_ref = jax.grad(lambda p: jnp.sum(
        plain.apply(p, x, train=False) ** 2))(params)
    g_got = jax.grad(lambda p: jnp.sum(
        packed.apply(p, x, train=False) ** 2))(params)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_got),
    ):
        key = jax.tree_util.keystr(kp)
        # A conv bias followed by InstanceNorm has an exactly-zero true
        # gradient (the norm subtracts it); what autodiff returns is
        # catastrophic-cancellation noise, so only an absolute bound is
        # meaningful there.
        atol = 2e-2 if key.endswith("['conv']['bias']") else 2e-3
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=8e-3, atol=atol,
            err_msg=key)


def test_packed_unet_prelu_matches_plain():
    """The packed path supports the thesis MultiInputUNet's learnable PReLU
    slopes with the same param path (conv_x/prelu_slope)."""
    from unet_bssfp_tpu.models.unet import BasicUNet3D

    x = _mk((1, 8, 8, 16, 3), 30)
    kw = dict(out_channels=2, features=(4, 4, 4, 4, 8, 4), dropout=0.0,
              dtype=jnp.float32, use_fused=False, prelu=True)
    plain = BasicUNet3D(packed=False, **kw)
    packed = BasicUNet3D(packed=True, **kw)
    params = plain.init(jax.random.PRNGKey(31), x, train=False)
    fa = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(params)}
    fb = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(
              packed.init(jax.random.PRNGKey(32), x, train=False))}
    assert fa == fb
    ref = plain.apply(params, x, train=False)
    got = packed.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pack_unpack_vjp():
    """pack/unpack are permutations with custom VJPs (the TPU path is a
    Pallas identity-GEMM, which has no automatic gradient): their
    cotangents must be the inverse permutations."""
    x = _mk((1, 2, 4, 32, 3), 20)
    dy_p = _mk((1, 2, 3, 128), 21)

    y, vjp = jax.vjp(pack_hw, x)
    (dx,) = vjp(dy_p)
    np.testing.assert_array_equal(
        np.asarray(dx), np.asarray(unpack_hw(dy_p, 32)))

    y2, vjp2 = jax.vjp(lambda xk: unpack_hw(xk, 32), pack_hw(x))
    (dxk,) = vjp2(x)
    np.testing.assert_array_equal(
        np.asarray(dxk), np.asarray(pack_hw(x)))


def test_pack_roundtrip_and_gate():
    x = _mk((1, 4, 8, 64, 3), 10)
    np.testing.assert_array_equal(
        np.asarray(unpack_hw(pack_hw(x), 64)), np.asarray(x))
    assert packed_supported((8, 64, 64, 64, 24))
    assert packed_supported((8, 96, 128, 128, 32))
    assert packed_supported((8, 32, 32, 32, 64))
    assert not packed_supported((8, 64, 64, 63, 24))   # W not in {32,64,128}
    assert not packed_supported((8, 64, 63, 64, 24))   # H % P != 0
    assert not packed_supported((8, 16, 16, 16, 256))  # C > 128


def test_packed_max_pool2_vjp_first_match_ties():
    """The custom pool backward must reproduce XLA select-and-scatter
    semantics exactly — including ties, which route ALL gradient to the
    first matching window position in (d, h, w) row-major order (quantized
    bf16-like activations tie often)."""
    from jax import lax

    from unet_bssfp_tpu.models.packed_layers import packed_max_pool2

    rng = np.random.default_rng(7)
    # heavy quantization → many exact ties inside 2×2×2 windows
    xk = jnp.asarray(
        np.round(rng.standard_normal((2, 8, 16, 8 * 8)) * 1.5) / 1.5
    ).astype(jnp.float32)

    def pool_ref(x):
        b, d, c, hw = x.shape
        w = 8
        h = hw // w
        xn = jnp.transpose(x.reshape(b, d, c, h, w), (0, 1, 3, 4, 2))
        return lax.reduce_window(
            xn, -jnp.inf, lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")

    y = packed_max_pool2(xk, 8)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(pool_ref(xk)))

    g_custom = jax.grad(lambda x: jnp.sum(packed_max_pool2(x, 8) ** 2))(xk)
    g_xla = jax.grad(lambda x: jnp.sum(pool_ref(x) ** 2))(xk)
    np.testing.assert_array_equal(np.asarray(g_custom), np.asarray(g_xla))


def test_wguard_kernel_matches_xla():
    """Guard-column layout (trailing zero lanes per w-row, wguard>0): the
    kernel skips the w-mask passes and re-zeroes output guards; numerics
    must still match the XLA SAME conv, and the VJP its autodiff."""
    import os

    from unet_bssfp_tpu.models.packed_layers import guard_cols

    B, D, H, W, CI, CO = 1, 4, 16, 64, 8, 8
    os.environ["UNET_BSSFP_WGUARD"] = "1"
    try:
        g = guard_cols(H, W)
    finally:
        del os.environ["UNET_BSSFP_WGUARD"]
    assert g > 0
    x = _mk((B, D, H, W, CI), 21)
    w = _mk((3, 3, 3, CI, CO), 22)
    bias = _mk((CO,), 23)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    xg = jnp.pad(x, ((0, 0),) * 3 + ((0, g), (0, 0)))
    xk = pack_hw(xg)
    got = conv3x3_packed(xk, w, bias, W + g, True, g)
    gotn = unpack_hw(got, W + g)
    np.testing.assert_allclose(
        np.asarray(gotn[:, :, :, :W]), np.asarray(ref),
        rtol=2e-4, atol=2e-5)
    # output guard columns must be exactly zero (downstream invariant)
    np.testing.assert_array_equal(
        np.asarray(gotn[:, :, :, W:]), 0.0)

    gp = jax.grad(
        lambda xk, w, b: jnp.sum(
            conv3x3_packed(xk, w, b, W + g, True, g) ** 2),
        argnums=(0, 1, 2))(xk, w, bias)
    gr = jax.grad(
        lambda x, w, b: jnp.sum(
            (jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b) ** 2),
        argnums=(0, 1, 2))(x, w, bias)
    dxn = unpack_hw(gp[0], W + g)[:, :, :, :W]
    np.testing.assert_allclose(np.asarray(dxn), np.asarray(gr[0]),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gr[2]),
                               rtol=2e-3, atol=2e-2)


def test_wguard_vjp_ignores_guard_cotangents():
    """The primal's guard columns are constants (always zero), so the VJP
    must ignore their cotangents. Downstream full-lane reductions —
    PackedConvNormAct's InstanceNorm sums — DO deliver nonzero guard
    cotangents; without the `_project_guard_cotangent` projection the
    guard-unmasked bwd rolls wrap them into data positions (dx rel-err up
    to ~1 in interpret-mode reproduction). Gradients of a loss over ALL
    lanes must equal gradients of the same loss over data lanes only."""
    import os

    from unet_bssfp_tpu.models.packed_layers import guard_cols
    from unet_bssfp_tpu.ops.pallas.conv3d import conv3x3_packed_halo

    B, D, H, W, CI, CO = 1, 2, 16, 64, 4, 4
    os.environ["UNET_BSSFP_WGUARD"] = "1"
    try:
        g = guard_cols(H, W)
    finally:
        del os.environ["UNET_BSSFP_WGUARD"]
    assert g > 0
    x = _mk((B, D, H, W, CI), 31)
    w = _mk((3, 3, 3, CI, CO), 32)
    bias = _mk((CO,), 33)
    xg = jnp.pad(x, ((0, 0),) * 3 + ((0, g), (0, 0)))
    xk = pack_hw(xg)

    def data_lanes(y):
        return unpack_hw(y, W + g)[:, :, :, :W]

    for conv, xin in (
        (lambda a, ww, b: conv3x3_packed(a, ww, b, W + g, True, g), xk),
        (lambda a, ww, b: conv3x3_packed_halo(
            jnp.pad(a, ((0, 0), (1, 1), (0, 0), (0, 0))), ww, b,
            W + g, True, g), xk),
    ):
        # (y + 1)²: cotangent 2(y+1) is nonzero at guard lanes (y=0 there)
        g_full = jax.grad(
            lambda a, ww, b: jnp.sum((conv(a, ww, b) + 1.0) ** 2),
            argnums=(0, 1, 2))(xin, w, bias)
        g_data = jax.grad(
            lambda a, ww, b: jnp.sum((data_lanes(conv(a, ww, b)) + 1.0) ** 2),
            argnums=(0, 1, 2))(xin, w, bias)
        for a, b in zip(g_full, g_data):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# pfold formulation (w-phases folded into GEMM M rows) — measured SLOWER than
# the packed kernel on v5e at every stage shape (scripts/pfold_probe.py,
# BENCH_NOTES_r3), kept as a correct opt-in probe of the kernel family.
# ---------------------------------------------------------------------------

PFOLD_SHAPES = [
    (1, 4, 8, 64, 3, 4),
    (2, 4, 16, 32, 5, 4),
    (1, 4, 8, 64, 8, 8),
]


@pytest.mark.parametrize("shape", PFOLD_SHAPES)
def test_pfold_forward_matches_xla(shape):
    from unet_bssfp_tpu.ops.pallas.conv3d import (
        conv3x3_pfold, fold4_pack, pfold_supported, unfold4_unpack)

    B, D, H, W, CIN, COUT = shape
    x = _mk((B, D, H, W, CIN), 40)
    w = _mk((3, 3, 3, CIN, COUT), 41)
    bias = _mk((COUT,), 42)
    assert pfold_supported((B, D, H, W, CIN))
    xf = fold4_pack(x)
    np.testing.assert_array_equal(
        np.asarray(unfold4_unpack(xf, W // 4)), np.asarray(x))
    got = unfold4_unpack(conv3x3_pfold(xf, w, bias, W // 4, True), W // 4)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", PFOLD_SHAPES[:2])
def test_pfold_vjp_matches_xla(shape):
    from unet_bssfp_tpu.ops.pallas.conv3d import (
        conv3x3_pfold, fold4_pack, unfold4_unpack)

    B, D, H, W, CIN, COUT = shape
    x = _mk((B, D, H, W, CIN), 43)
    w = _mk((3, 3, 3, CIN, COUT), 44)
    bias = _mk((COUT,), 45)
    dyn = _mk((B, D, H, W, COUT), 46)
    xf = fold4_pack(x)
    dy = fold4_pack(dyn)

    def ref_fn(x_, w_, b_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b_

    _, vjp_ref = jax.vjp(ref_fn, x, w, bias)
    dx_r, dw_r, db_r = vjp_ref(dyn)
    _, vjp_got = jax.vjp(
        lambda x_, w_, b_: conv3x3_pfold(x_, w_, b_, W // 4, True),
        xf, w, bias)
    dx_g, dw_g, db_g = vjp_got(dy)
    np.testing.assert_allclose(
        np.asarray(unfold4_unpack(dx_g, W // 4)), np.asarray(dx_r),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_g), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_g), np.asarray(db_r),
                               rtol=1e-4, atol=1e-4)


def test_pfold_halo_matches_xla():
    """Space-sharded variant: input carries a 1-slice d halo per side."""
    from unet_bssfp_tpu.ops.pallas.conv3d import (
        conv3x3_pfold_halo, fold4_pack, unfold4_unpack)

    B, D, H, W, CIN, COUT = 2, 4, 8, 64, 5, 4
    x = _mk((B, D + 2, H, W, CIN), 47)
    w = _mk((3, 3, 3, CIN, COUT), 48)
    bias = _mk((COUT,), 49)
    xp = fold4_pack(x)
    got = unfold4_unpack(
        conv3x3_pfold_halo(xp, w, bias, W // 4, True), W // 4)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
