"""Distributional parity checks for the augmentation suite (SURVEY.md §7:
exact TorchIO RNG parity is impossible; parity is distributional — parameter
ranges and artifact models must match the TorchIO definitions the reference
uses at src/data_module.py:130-139)."""

import jax
import jax.numpy as jnp
import numpy as np

from unet_bssfp_tpu.data import augment


def _many(fn, vol, n=64, **kw):
    outs = []
    for i in range(n):
        outs.append(np.asarray(fn(jax.random.PRNGKey(i), vol, **kw)))
    return np.stack(outs)


def test_noise_std_in_sampled_range(rng):
    vol = jnp.zeros((8, 8, 8, 1))
    outs = _many(augment.random_noise, vol, n=64, std_range=(0.01, 0.1))
    stds = outs.reshape(64, -1).std(axis=1)
    # Every draw's empirical std within the sampled parameter range (plus
    # sampling slack).
    assert (stds > 0.005).all() and (stds < 0.13).all()
    # Parameter actually varies across draws.
    assert stds.max() > 2 * stds.min()
    # Zero-mean noise.
    means = outs.reshape(64, -1).mean(axis=1)
    assert np.abs(means).max() < 0.02


def test_gamma_preserves_range_and_monotonic(rng):
    vol = jnp.asarray(rng.random((8, 8, 8, 1)).astype(np.float32))
    outs = _many(augment.random_gamma, vol, n=16)
    # Gamma on [0,1] stays in [0,1] and preserves ordering.
    assert outs.min() >= 0 and outs.max() <= 1.0 + 1e-6
    flat = np.asarray(vol).ravel()
    order = np.argsort(flat)
    for o in outs[:4]:
        of = o.ravel()[order]
        assert (np.diff(of) >= -1e-6).all()


def test_bias_field_is_multiplicative_smooth(rng):
    vol = jnp.ones((12, 12, 12, 1))
    out = np.asarray(
        augment.random_bias_field(jax.random.PRNGKey(5), vol)
    )[..., 0]
    # Field = exp(poly): positive everywhere, smooth (small local gradients
    # relative to dynamic range).
    assert (out > 0).all()
    grad = np.abs(np.diff(out, axis=0)).max()
    dyn = out.max() - out.min()
    assert dyn > 0.01  # actually does something
    # Low-frequency: per-voxel step bounded well below the dynamic range
    # (order-3 poly on a 12-voxel axis steps ~0.18 in normalised coords).
    assert grad < 0.5 * dyn + 1e-3


def test_spike_adds_periodic_artifact(rng):
    vol = jnp.asarray(rng.random((16, 16, 16, 1)).astype(np.float32))
    out = np.asarray(augment.random_spike(jax.random.PRNGKey(1), vol))
    diff = out - np.asarray(vol)
    # k-space spike → spatially global, roughly constant-magnitude ripple.
    assert np.abs(diff).mean() > 1e-4
    per_voxel = np.abs(diff[..., 0])
    assert per_voxel.max() < 20 * (per_voxel.mean() + 1e-9)


def test_ghosting_attenuates_offcenter_kspace(rng):
    vol = jnp.asarray(rng.random((16, 16, 16, 1)).astype(np.float32))
    out = np.asarray(augment.random_ghosting(jax.random.PRNGKey(2), vol))
    spec_in = np.abs(np.fft.fftn(np.asarray(vol)[..., 0]))
    spec_out = np.abs(np.fft.fftn(out[..., 0]))
    # DC (k-space centre) preserved.
    np.testing.assert_allclose(spec_out[0, 0, 0], spec_in[0, 0, 0], rtol=1e-4)
    # Total spectral energy reduced (planes attenuated).
    assert spec_out.sum() < spec_in.sum()


def test_motion_preserves_dc_and_energy_scale(rng):
    vol = jnp.asarray(rng.random((16, 16, 16, 1)).astype(np.float32))
    out = np.asarray(augment.random_motion(jax.random.PRNGKey(3), vol))
    # Translation phase ramps don't change |k|: energy approximately kept.
    e_in = float((np.asarray(vol) ** 2).sum())
    e_out = float((out**2).sum())
    assert 0.5 * e_in < e_out < 1.5 * e_in
    assert not np.allclose(out, np.asarray(vol))


def test_rotate_trilinear_matches_scipy(rng):
    """Golden: the on-device trilinear rigid rotation matches
    scipy.ndimage.rotate (order=1) on the volume interior."""
    from scipy.ndimage import rotate as sprot

    vol = rng.random((15, 15, 15, 1)).astype(np.float32)
    # Exact 90° about z: voxel-to-voxel mapping.
    out = np.asarray(
        augment.rotate_trilinear(
            jnp.asarray(vol), jnp.array([np.pi / 2, 0.0, 0.0])
        )
    )
    ref = sprot(vol[..., 0], 90, axes=(1, 2), reshape=False, order=1,
                mode="nearest")
    np.testing.assert_allclose(
        out[2:-2, 2:-2, 2:-2, 0], ref[2:-2, 2:-2, 2:-2], atol=1e-5
    )
    # Small angle about y (scipy's sign convention for this plane is
    # opposite; the augmentation samples symmetrically from U(-a, a)).
    out = np.asarray(
        augment.rotate_trilinear(
            jnp.asarray(vol), jnp.array([0.0, np.deg2rad(7), 0.0])
        )
    )
    ref = sprot(vol[..., 0], -7, axes=(0, 2), reshape=False, order=1,
                mode="nearest")
    np.testing.assert_allclose(
        out[2:-2, 2:-2, 2:-2, 0], ref[2:-2, 2:-2, 2:-2], atol=1e-5
    )
    # Zero rotation is the identity.
    out0 = np.asarray(
        augment.rotate_trilinear(jnp.asarray(vol), jnp.zeros(3))
    )
    np.testing.assert_array_equal(out0, vol)


def test_motion_rotation_sensitivity(rng):
    """Rotations contribute to the motion composite (VERDICT item 6): with
    translations disabled, nonzero degrees must still alter the volume, and
    more rotation ⇒ more change."""
    vol = jnp.asarray(
        np.cumsum(rng.random((16, 16, 16, 1)), axis=1).astype(np.float32)
    )
    key = jax.random.PRNGKey(5)
    out0 = np.asarray(augment.random_motion(key, vol, degrees=0.0,
                                            translation=0.0))
    out_small = np.asarray(augment.random_motion(key, vol, degrees=5.0,
                                                 translation=0.0))
    out_large = np.asarray(augment.random_motion(key, vol, degrees=30.0,
                                                 translation=0.0))
    # degrees=0, translation=0 ⇒ all segments identical ⇒ identity.
    np.testing.assert_allclose(out0, np.asarray(vol), atol=1e-4)
    d_small = np.abs(out_small - np.asarray(vol)).mean()
    d_large = np.abs(out_large - np.asarray(vol)).mean()
    assert d_small > 1e-5, "rotation had no effect"
    assert d_large > d_small


def test_subject_level_same_params_across_images(rng):
    """TorchIO subject semantics: the same sampled transform applies to every
    image of the subject — two identical volumes must stay identical after
    augmentation with the same key."""
    v = jnp.asarray(rng.random((8, 8, 8, 1)).astype(np.float32))
    subject = {"a": v, "b": v}
    out = augment.augment_subject(
        jax.random.PRNGKey(11), subject, prob=1.0, keep={}
    )
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(out["b"]))
