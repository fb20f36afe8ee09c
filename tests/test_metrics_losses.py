"""Metric/loss parity vs analytic values and torch-CPU references
(SURVEY.md §4e)."""

import numpy as np
import jax.numpy as jnp
import pytest

from unet_bssfp_tpu.ops.metrics import psnr, ssim3d, mae, fid, znorm, spatial_average
from unet_bssfp_tpu.ops.losses import l1_loss, bce_with_logits, ssim_loss
from unet_bssfp_tpu.ops.error_maps import (
    relative_error_map,
    angular_error_map,
    roi_weighted_mean_errors,
    masked_probseg,
)


def test_psnr_analytic():
    x = jnp.zeros((2, 4, 4, 4, 1))
    y = jnp.full((2, 4, 4, 4, 1), 0.1)
    # mse = 0.01 → psnr = 10*log10(1/0.01) = 20 dB
    np.testing.assert_allclose(np.asarray(psnr(x, y)), [20.0, 20.0], rtol=1e-5)


def test_mae_and_l1():
    x = jnp.zeros((2, 3, 3, 3, 2))
    y = jnp.full((2, 3, 3, 3, 2), 0.5)
    np.testing.assert_allclose(np.asarray(mae(x, y)), [0.5, 0.5], rtol=1e-6)
    np.testing.assert_allclose(float(l1_loss(x, y)), 0.5, rtol=1e-6)


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 16, 2)).astype(np.float32))
    s = ssim3d(x, x)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)
    assert float(ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-5)


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1)).astype(np.float32))
    noise = jnp.asarray(
        (rng.standard_normal((1, 16, 16, 16, 1)) * 0.1).astype(np.float32)
    )
    s_clean = float(ssim3d(x, x)[0])
    s_noisy = float(ssim3d(x, x + noise)[0])
    assert s_noisy < s_clean
    assert 0.0 < s_noisy < 1.0


def test_ssim_matches_torch_reference(rng):
    """Cross-check vs a direct torch conv implementation of gaussian SSIM."""
    torch = pytest.importorskip("torch")
    x = rng.random((1, 12, 12, 12, 1)).astype(np.float32)
    y = rng.random((1, 12, 12, 12, 1)).astype(np.float32)
    ours = float(ssim3d(jnp.asarray(x), jnp.asarray(y))[0])

    # torch reference: same gaussian window, valid padding.
    win, sigma = 11, 1.5
    coords = torch.arange(win, dtype=torch.float64) - (win - 1) / 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    kern = g[:, None, None] * g[None, :, None] * g[None, None, :]
    kern = kern[None, None]

    def blur(t):
        return torch.nn.functional.conv3d(t, kern)

    tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3).double()
    ty = torch.from_numpy(y).permute(0, 4, 1, 2, 3).double()
    mu_x, mu_y = blur(tx), blur(ty)
    var_x = blur(tx * tx) - mu_x**2
    var_y = blur(ty * ty) - mu_y**2
    cov = blur(tx * ty) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    )
    ref = float(smap.mean())
    assert ours == pytest.approx(ref, abs=1e-4)


def test_bce_with_logits_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal((4, 2, 2, 2, 1)).astype(np.float32) * 3
    labels = (rng.random((4, 2, 2, 2, 1)) > 0.5).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(labels)
        )
    )
    assert ours == pytest.approx(ref, abs=1e-6)


def test_fid_zero_for_identical_and_positive_for_shifted(rng):
    f = rng.standard_normal((64, 8)).astype(np.float32)
    d0 = float(fid(jnp.asarray(f), jnp.asarray(f)))
    assert d0 == pytest.approx(0.0, abs=1e-3)
    d1 = float(fid(jnp.asarray(f), jnp.asarray(f + 2.0)))
    # Mean shift of 2 in 8 dims → |mu diff|^2 = 32.
    assert d1 == pytest.approx(32.0, abs=0.5)


def test_znorm_and_spatial_average(rng):
    x = jnp.asarray(rng.random((2, 4, 4, 4, 3)).astype(np.float32))
    z = znorm(x)
    assert float(jnp.mean(z)) == pytest.approx(0.0, abs=1e-5)
    assert float(jnp.std(z)) == pytest.approx(1.0, abs=1e-4)
    sa = spatial_average(x)
    assert sa.shape == (2, 3)


def test_error_maps_match_reference_semantics():
    pred = jnp.asarray([[1.0, 2.0], [3.0, 0.5]])
    target = jnp.asarray([[2.0, 2.0], [2.0, 1.0]])
    rel = np.asarray(relative_error_map(pred, target))
    np.testing.assert_allclose(rel, [[0.5, 0.0], [0.5, 0.5]])

    # Angular wraparound: (350 - 10) % 360 = 340 → 20.
    ang = float(angular_error_map(jnp.asarray(350.0), jnp.asarray(10.0)))
    assert ang == pytest.approx(20.0)
    ang2 = float(angular_error_map(jnp.asarray(10.0), jnp.asarray(350.0)))
    assert ang2 == pytest.approx(20.0)


def test_roi_weighted_mean_errors(rng):
    s = (4, 4, 4)
    diff = np.abs(rng.standard_normal(s + (2,))).astype(np.float32)
    mask = (rng.random(s) > 0.3).astype(np.float32)
    probseg = rng.random(s + (3,)).astype(np.float32)
    probseg_m = np.asarray(masked_probseg(jnp.asarray(mask), jnp.asarray(probseg)))

    out = np.asarray(
        roi_weighted_mean_errors(
            jnp.asarray(diff), jnp.asarray(mask), jnp.asarray(probseg_m)
        )
    )
    assert out.shape == (3, 2)
    # NumPy reference (the reference's loop at src/eval.py:243-249).
    dm = np.where(mask[..., None] > 0, np.abs(diff), 0)
    for r in range(3):
        for c in range(2):
            expect = (probseg_m[..., r] * dm[..., c]).sum() / probseg_m[..., r].sum()
            assert out[r, c] == pytest.approx(expect, rel=1e-4)


def test_roi_errors_zero_inf():
    diff = jnp.asarray(np.full((2, 2, 2, 1), np.inf, np.float32))
    mask = jnp.ones((2, 2, 2))
    probseg = jnp.ones((2, 2, 2, 1))
    out = np.asarray(roi_weighted_mean_errors(diff, mask, probseg))
    np.testing.assert_allclose(out, 0.0)
