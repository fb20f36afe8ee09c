"""Pallas kernel parity vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from unet_bssfp_tpu.ops.pallas.fused_norm_act import (
    fused_instance_norm_leaky_relu,
    instance_norm_leaky_relu_reference,
)


def test_fused_in_lrelu_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 128)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    ref = instance_norm_leaky_relu_reference(x, scale, bias, 0.1)
    out = fused_instance_norm_leaky_relu(x, scale, bias, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_in_lrelu_fallback_on_odd_channels(rng):
    # 24 channels — not a supported block size multiple below 128 → uses the
    # channels<=128 path; 30 channels with huge spatial falls back to XLA.
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 24)).astype(np.float32))
    scale = jnp.ones(24)
    bias = jnp.zeros(24)
    ref = instance_norm_leaky_relu_reference(x, scale, bias, 0.2)
    out = fused_instance_norm_leaky_relu(
        x, scale, bias, 0.2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_in_lrelu_bf16(rng):
    x = jnp.asarray(
        rng.standard_normal((1, 8, 8, 8, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    ref = instance_norm_leaky_relu_reference(x, scale, bias, 0.1)
    out = fused_instance_norm_leaky_relu(x, scale, bias, 0.1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
    assert out.dtype == jnp.bfloat16


def test_scalar_maps_kernel_matches_xla(rng):
    from unet_bssfp_tpu.ops.pallas.scalar_maps_kernel import (
        compute_scalar_maps_fused,
    )
    from unet_bssfp_tpu.ops.scalar_maps import compute_scalar_maps

    d6 = jnp.asarray(rng.standard_normal((8, 12, 16, 6)).astype(np.float32) * 1e-3)
    ref = compute_scalar_maps(d6)
    out = compute_scalar_maps_fused(d6, interpret=True)
    for field in ("fa", "md", "ad", "rd", "rgb"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(ref, field)),
            atol=1e-4,
            err_msg=field,
        )
    # Angles use the kernel's polynomial atan2 (max err ~6e-4 deg).
    for field in ("azimuth", "inclination"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, field)),
            np.asarray(getattr(ref, field)),
            atol=2e-3,
            err_msg=field,
        )


def test_scalar_maps_kernel_nonaligned_size(rng):
    """Voxel count not a multiple of 128 exercises the padding path."""
    from unet_bssfp_tpu.ops.pallas.scalar_maps_kernel import (
        compute_scalar_maps_fused,
    )
    from unet_bssfp_tpu.ops.scalar_maps import compute_scalar_maps

    d6 = jnp.asarray(rng.standard_normal((5, 7, 3, 6)).astype(np.float32))
    ref = compute_scalar_maps(d6)
    out = compute_scalar_maps_fused(d6, interpret=True)
    np.testing.assert_allclose(np.asarray(out.fa), np.asarray(ref.fa),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=1e-4)
