"""Image-quality metrics: PSNR, 3D SSIM, MAE, FID.

TPU-native equivalents of the reference's MONAI metrics
(``src/model.py:158-163``): ``PSNRMetric(1)``, ``SSIMMetric(3, data_range=1)``,
``MAEMetric()``, and the custom MedicalNet FID (``src/model.py:235-257``).

Array convention: batched volumes are channels-last ``(N, D, H, W, C)``
(TPU-friendly; NIfTI is channels-last on disk too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten_per_item(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-item PSNR in dB with fixed peak value (reference uses
    ``monai.metrics.PSNRMetric(1)``, ``src/model.py:158``).

    Returns shape ``(N,)``.
    """
    mse = jnp.mean(
        (_flatten_per_item(pred) - _flatten_per_item(target)) ** 2, axis=-1
    )
    return 10.0 * jnp.log10(max_val**2 / jnp.where(mse == 0, 1e-30, mse))


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-item mean absolute error (``monai.metrics.MAEMetric``,
    ``src/model.py:160``). Returns shape ``(N,)``."""
    return jnp.mean(
        jnp.abs(_flatten_per_item(pred) - _flatten_per_item(target)), axis=-1
    )


def _gaussian_kernel1d(win_size: int, sigma: float, dtype) -> jax.Array:
    half = (win_size - 1) / 2.0
    coords = jnp.arange(win_size, dtype=dtype) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _separable_blur3d(x: jax.Array, kernel1d: jax.Array) -> jax.Array:
    """Depthwise separable 3D gaussian filter on ``(N, D, H, W, C)`` (valid
    padding, matching MONAI's uncropped SSIM window behaviour)."""
    n, d, h, w, c = x.shape
    k = kernel1d.shape[0]
    # Convolve each spatial axis with a 1D kernel via conv_general_dilated
    # with feature_group_count=C (depthwise).
    def conv_axis(y, axis):
        shape = [1, 1, 1, 1, 1]
        shape[axis] = k
        kern = kernel1d.reshape(shape[1:4] + [1, 1])  # (kd,kh,kw,1,1)
        # lhs: NDHWC, rhs: DHWIO with I=1 (depthwise), O per group = 1
        kern_full = jnp.broadcast_to(kern, kern.shape[:3] + (1, c))
        # Metrics must run at full precision: the default conv precision is
        # reduced (bf16 passes) and visibly perturbs SSIM.
        return jax.lax.conv_general_dilated(
            y,
            kern_full,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    y = conv_axis(x, 1)
    y = conv_axis(y, 2)
    y = conv_axis(y, 3)
    return y


def ssim3d(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-item 3D SSIM with a gaussian window, matching MONAI
    ``SSIMMetric(spatial_dims=3, data_range=1)`` defaults (win 11, sigma 1.5)
    (reference ``src/model.py:159``). Returns shape ``(N,)``.
    """
    dtype = jnp.promote_types(pred.dtype, jnp.float32)
    x = pred.astype(dtype)
    y = target.astype(dtype)
    # Clamp the window to the smallest spatial dim (odd) so small patches
    # still produce a valid (non-empty) SSIM map.
    min_dim = min(pred.shape[1:4])
    if win_size > min_dim:
        win_size = min_dim if min_dim % 2 == 1 else min_dim - 1
    kern = _gaussian_kernel1d(win_size, sigma, dtype)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _separable_blur3d(x, kern)
    mu_y = _separable_blur3d(y, kern)
    mu_xx = _separable_blur3d(x * x, kern)
    mu_yy = _separable_blur3d(y * y, kern)
    mu_xy = _separable_blur3d(x * y, kern)

    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * cov_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    ssim_map = num / den
    return jnp.mean(_flatten_per_item(ssim_map), axis=-1)


def _cov(feats: jax.Array) -> jax.Array:
    """Unbiased feature covariance, features as columns: feats (N, F)."""
    mu = jnp.mean(feats, axis=0, keepdims=True)
    x = feats - mu
    n = feats.shape[0]
    return (x.T @ x) / jnp.maximum(n - 1, 1)


def fid(feats_pred: jax.Array, feats_target: jax.Array) -> jax.Array:
    """Frechet distance between two feature populations ``(N, F)``.

    Same quantity as ``monai.metrics.FIDMetric`` (reference
    ``src/model.py:163,257``):
    ``|mu_x - mu_y|^2 + tr(Sx + Sy - 2 (Sx Sy)^{1/2})``.

    Computed via the exact N x N Gram reduction instead of an F x F sqrtm:
    with centered features A, B (N x F), the nonzero eigenvalues of
    ``Sx Sy = (A^T A)(B^T B)/(n-1)^2`` equal those of the PSD matrix
    ``C^T C/(n-1)^2`` where ``C = B A^T`` (N x N), so
    ``tr (Sx Sy)^{1/2} = sum(singular values of C)/(n-1)``.
    For deep-feature batches N << F this is both ~1e6x cheaper and
    numerically exact where an F x F float32 eigendecomposition of a rank-N
    covariance produces O(100) phantom mass (identical populations then give
    FID ~= 0 as they must).
    """
    dtype = jnp.float32
    fx = feats_pred.astype(dtype)
    fy = feats_target.astype(dtype)
    n = fx.shape[0]
    denom = jnp.maximum(n - 1, 1)
    a = fx - jnp.mean(fx, axis=0, keepdims=True)
    b = fy - jnp.mean(fy, axis=0, keepdims=True)

    tr_sx = jnp.sum(a * a) / denom
    tr_sy = jnp.sum(b * b) / denom
    c = b @ a.T  # (N, N)
    wc = jnp.linalg.eigh(c.T @ c)[0]
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.clip(wc, 0.0))) / denom

    mu_x, mu_y = jnp.mean(fx, axis=0), jnp.mean(fy, axis=0)
    diff = mu_x - mu_y
    # Mathematically >= 0; clamp away float32 cancellation noise.
    return jnp.maximum(diff @ diff + tr_sx + tr_sy - 2.0 * tr_sqrt, 0.0)


def znorm(volume: jax.Array) -> jax.Array:
    """Whole-tensor z-normalisation used before MedicalNet features
    (reference ``src/model.py:222-226``)."""
    return (volume - jnp.mean(volume)) / jnp.std(volume)


def spatial_average(feats: jax.Array) -> jax.Array:
    """Average features over the spatial dims of ``(N, D, H, W, C)`` →
    ``(N, C)`` (reference ``src/model.py:228-230`` averages dims 2,3,4 of
    NCDHW)."""
    return jnp.mean(feats, axis=(1, 2, 3))
