"""Stochastic MRI augmentations as pure-functional RNG-keyed JAX transforms.

TPU-native re-derivation of the reference's TorchIO train/val augmentation
chain (``src/data_module.py:130-139``): RandomMotion, RandomGhosting,
RandomSpike(0.01-0.1), RandomBiasField, RandomBlur(0.01-0.1),
RandomNoise(0.01-0.1), RandomGamma — each applied with p=0.1 — with the
``keep={'dwi-tensor': 'dwi-tensor_orig'}`` semantics (the un-augmented target
is preserved) implemented by :func:`augment_subject`.

Exact RNG parity with TorchIO is impossible (different generators); parity is
distributional (SURVEY.md §7 hard parts): parameter ranges and artifact models
follow TorchIO's definitions. The k-space transforms (spike/ghosting/motion)
use ``jnp.fft`` on device; motion follows TorchIO's rigid-composite model —
per-segment rotations via trilinear resampling plus k-space-exact
translations (phase ramps).

All transforms take/return a channels-last ``(D, H, W, C)`` volume and are
jit-compatible (no data-dependent shapes; probability gating uses
``jnp.where`` on lax-selected branches).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# intensity transforms
# --------------------------------------------------------------------------

def random_noise(
    key: jax.Array, vol: jax.Array, std_range=(0.01, 0.1), mean: float = 0.0
) -> jax.Array:
    """Additive gaussian noise, std ~ U(std_range) (tio ``RandomNoise``;
    reference uses std=(0.01, 0.1))."""
    k_std, k_noise = jax.random.split(key)
    std = jax.random.uniform(
        k_std, (), minval=std_range[0], maxval=std_range[1]
    )
    return vol + mean + std * jax.random.normal(k_noise, vol.shape, vol.dtype)


def random_gamma(key: jax.Array, vol: jax.Array, log_gamma=(-0.3, 0.3)) -> jax.Array:
    """Gamma intensity transform, gamma = exp(U(log_gamma)) (tio
    ``RandomGamma`` defaults). Negative values pass through unchanged (tio
    applies gamma to |x| preserving sign only with invert; here we clamp at 0
    like tio's power on non-negative normalised data)."""
    g = jnp.exp(
        jax.random.uniform(key, (), minval=log_gamma[0], maxval=log_gamma[1])
    )
    return jnp.sign(vol) * jnp.power(jnp.abs(vol), g)


def random_blur(key: jax.Array, vol: jax.Array, std_range=(0.01, 0.1)) -> jax.Array:
    """Gaussian blur with per-axis std ~ U(std_range) voxels (tio
    ``RandomBlur``; reference uses std=(0.01, 0.1) — sub-voxel, i.e. a mild
    smoothing). Fixed 5-tap kernel per axis (covers sigma ≤ 1)."""
    stds = jax.random.uniform(
        key, (3,), minval=std_range[0], maxval=std_range[1]
    )
    taps = jnp.arange(-2.0, 3.0)

    out = vol
    for ax in range(3):
        sigma = jnp.maximum(stds[ax], 1e-3)
        k = jnp.exp(-(taps**2) / (2.0 * sigma**2))
        k = k / jnp.sum(k)
        moved = jnp.moveaxis(out, ax, -1)  # (…, C, L) after next reshape
        shape = moved.shape
        flat = moved.reshape(-1, shape[-1])
        padded = jnp.pad(flat, ((0, 0), (2, 2)), mode="edge")
        # Correlate along the last axis with the 5-tap kernel.
        res = sum(
            padded[:, i : i + shape[-1]] * k[i] for i in range(5)
        )
        out = jnp.moveaxis(res.reshape(shape), -1, ax)
    return out


def random_bias_field(
    key: jax.Array, vol: jax.Array, coefficients: float = 0.5, order: int = 3
) -> jax.Array:
    """Multiplicative low-frequency bias field: exp of an order-3 polynomial
    in normalised coords with coefficients ~ U(-c, c) (tio
    ``RandomBiasField`` defaults, Van Leemput 1999 model; thesis
    03-methods.tex describes the same basis)."""
    d, h, w = vol.shape[:3]
    zs = jnp.linspace(-1.0, 1.0, d)[:, None, None]
    ys = jnp.linspace(-1.0, 1.0, h)[None, :, None]
    xs = jnp.linspace(-1.0, 1.0, w)[None, None, :]

    n_coeff = sum(
        1
        for i in range(order + 1)
        for j in range(order + 1 - i)
        for k2 in range(order + 1 - i - j)
    )
    coeffs = jax.random.uniform(
        key, (n_coeff,), minval=-coefficients, maxval=coefficients
    )
    field = jnp.zeros((d, h, w))
    idx = 0
    for i in range(order + 1):
        for j in range(order + 1 - i):
            for k2 in range(order + 1 - i - j):
                field = field + coeffs[idx] * (zs**i) * (ys**j) * (xs**k2)
                idx += 1
    return vol * jnp.exp(field)[..., None]


# --------------------------------------------------------------------------
# k-space transforms
# --------------------------------------------------------------------------

def _fft3(vol: jax.Array) -> jax.Array:
    return jnp.fft.fftn(vol.astype(jnp.complex64), axes=(0, 1, 2))


def _ifft3(spec: jax.Array) -> jax.Array:
    return jnp.fft.ifftn(spec, axes=(0, 1, 2)).real


def random_spike(
    key: jax.Array, vol: jax.Array, intensity=(0.01, 0.1), num_spikes: int = 1
) -> jax.Array:
    """k-space spike ('herringbone') artifact (tio ``RandomSpike``; reference
    intensity=(0.01, 0.1)): add spikes of magnitude ``r * max|spectrum|`` at
    random k-space positions."""
    k_pos, k_int = jax.random.split(key)
    spec = _fft3(vol)
    d, h, w = vol.shape[:3]
    pos = jnp.floor(
        jax.random.uniform(k_pos, (num_spikes, 3))
        * jnp.array([d, h, w], jnp.float32)
    ).astype(jnp.int32)
    r = jax.random.uniform(
        k_int, (), minval=intensity[0], maxval=intensity[1]
    )
    peak = jnp.max(jnp.abs(spec))
    for s in range(num_spikes):
        spike = jnp.zeros((d, h, w, 1), spec.dtype).at[
            pos[s, 0], pos[s, 1], pos[s, 2], 0
        ].set(peak * r)
        spec = spec + spike
    return _ifft3(spec)


def random_ghosting(
    key: jax.Array,
    vol: jax.Array,
    num_ghosts=(4, 10),
    intensity=(0.5, 1.0),
) -> jax.Array:
    """Ghosting along a random phase-encode axis (tio ``RandomGhosting``
    defaults): attenuate every n-th k-space plane (sparing the k-space
    centre) by the sampled intensity."""
    k_ax, k_n, k_int = jax.random.split(key, 3)
    axis = jax.random.randint(k_ax, (), 0, 3)
    n_ghosts = jax.random.randint(
        k_n, (), num_ghosts[0], num_ghosts[1] + 1
    )
    inten = jax.random.uniform(
        k_int, (), minval=intensity[0], maxval=intensity[1]
    )
    spec = _fft3(vol)

    def ghost_along(ax_len, ax):
        ids = jnp.arange(ax_len)
        is_ghost = (jnp.mod(ids, n_ghosts) == 0) & (ids != 0)
        scale = jnp.where(is_ghost, 1.0 - inten, 1.0)
        shape = [1, 1, 1, 1]
        shape[ax] = ax_len
        return scale.reshape(shape)

    s0 = ghost_along(vol.shape[0], 0)
    s1 = ghost_along(vol.shape[1], 1)
    s2 = ghost_along(vol.shape[2], 2)
    # Select the per-axis scale without data-dependent shapes: apply all three
    # but neutralise the inactive ones.
    one = jnp.float32(1.0)
    sel0 = jnp.where(axis == 0, s0, one)
    sel1 = jnp.where(axis == 1, s1, one)
    sel2 = jnp.where(axis == 2, s2, one)
    spec = spec * sel0 * sel1 * sel2
    return _ifft3(spec)


def _euler_matrix(angles: jax.Array) -> jax.Array:
    """Rotation matrix from Euler angles (radians) about the volume axes
    (z, y, x order — matching SimpleITK's Euler3D used by TorchIO)."""
    cz, sz = jnp.cos(angles[0]), jnp.sin(angles[0])
    cy, sy = jnp.cos(angles[1]), jnp.sin(angles[1])
    cx, sx = jnp.cos(angles[2]), jnp.sin(angles[2])
    rz = jnp.array([[1, 0, 0], [0, cz, -sz], [0, sz, cz]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = jnp.array([[cx, -sx, 0], [sx, cx, 0], [0, 0, 1]])
    return rz @ ry @ rx


def rotate_trilinear(vol: jax.Array, angles: jax.Array) -> jax.Array:
    """Rigid rotation of a ``(D, H, W, C)`` volume about its centre, trilinear
    interpolation, edge-clamped sampling (a jit-friendly gather — the
    on-device replacement for the scipy/SimpleITK resample TorchIO calls)."""
    d, h, w = vol.shape[:3]
    rot = _euler_matrix(angles)
    centre = (jnp.array([d, h, w], jnp.float32) - 1.0) / 2.0
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(d, dtype=jnp.float32),
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    coords = jnp.stack([zz, yy, xx], axis=-1) - centre  # (D, H, W, 3)
    # Inverse mapping: source = R⁻¹ · (target - c) + c; R orthonormal ⇒ Rᵀ.
    src = coords @ rot + centre  # (coords @ rot) == (rot.T @ coords.T).T
    lo = jnp.floor(src)
    frac = src - lo
    lo = lo.astype(jnp.int32)

    def clamp(idx, n):
        return jnp.clip(idx, 0, n - 1)

    out = jnp.zeros_like(vol)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                zi = clamp(lo[..., 0] + dz, d)
                yi = clamp(lo[..., 1] + dy, h)
                xi = clamp(lo[..., 2] + dx, w)
                wz = frac[..., 0] if dz else 1.0 - frac[..., 0]
                wy = frac[..., 1] if dy else 1.0 - frac[..., 1]
                wx = frac[..., 2] if dx else 1.0 - frac[..., 2]
                out = out + (wz * wy * wx)[..., None] * vol[zi, yi, xi, :]
    return out


def random_motion(
    key: jax.Array,
    vol: jax.Array,
    degrees: float = 10.0,
    translation: float = 10.0,
    num_transforms: int = 2,
) -> jax.Array:
    """Motion artifact (tio ``RandomMotion``, reference
    ``src/data_module.py:131``): compose the k-spaces of ``num_transforms``
    rigidly-moved copies of the volume — rotation ~ U(-degrees, degrees) per
    Euler axis applied by trilinear resampling, translation ~ U(-t, t) mm
    (≈voxels at iso resolution) applied exactly in k-space (linear phase
    ramp). The composite splits k-space into time segments along the
    phase-encode axis like TorchIO's model.
    """
    keys = jax.random.split(key, num_transforms)
    spec0 = _fft3(vol)
    d, h, w = vol.shape[:3]
    fz = jnp.fft.fftfreq(d)[:, None, None, None]
    fy = jnp.fft.fftfreq(h)[None, :, None, None]
    fx = jnp.fft.fftfreq(w)[None, None, :, None]

    # Split k-space planes along axis 0 into (num_transforms+1) time segments.
    ids = jnp.arange(d)[:, None, None, None]
    seg_len = d // (num_transforms + 1)
    spec = spec0
    for t in range(num_transforms):
        k_rot, k_shift = jax.random.split(keys[t])
        angles = jax.random.uniform(
            k_rot, (3,),
            minval=-degrees * jnp.pi / 180.0,
            maxval=degrees * jnp.pi / 180.0,
        )
        spec_t = _fft3(rotate_trilinear(vol, angles))
        shift = jax.random.uniform(
            k_shift, (3,), minval=-translation, maxval=translation
        )
        # Complex exp does not lower on TPU; build the unit phasor from
        # real cos/sin.
        phase = (
            -2.0
            * jnp.pi
            * (fz * shift[0] + fy * shift[1] + fx * shift[2])
        ).astype(jnp.float32)
        ramp = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        seg_start = (t + 1) * seg_len
        in_seg = ids >= seg_start
        spec = jnp.where(in_seg, spec_t * ramp, spec)
    return _ifft3(spec)


# --------------------------------------------------------------------------
# composed subject-level augmentation
# --------------------------------------------------------------------------

_DEFAULT_CHAIN = (
    ("motion", random_motion),
    ("ghosting", random_ghosting),
    ("spike", random_spike),
    ("bias_field", random_bias_field),
    ("blur", random_blur),
    ("noise", random_noise),
    ("gamma", random_gamma),
)


@partial(jax.jit, static_argnames=("prob",))
def augment_volume(
    key: jax.Array, vol: jax.Array, prob: float = 0.1
) -> jax.Array:
    """Apply the 7-transform chain, each gated with probability ``prob``
    (reference: each p=0.1, ``src/data_module.py:130-139``).

    Jitted: the tunneled TPU backend only implements a subset of ops for
    *eager* dispatch (several transforms raise UNIMPLEMENTED un-jitted), and
    one compiled program per volume shape is faster anyway.

    Gating uses ``lax.cond`` so only the taken branch executes — at p=0.1
    per transform, ``jnp.where`` would pay all four k-space FFT round-trips
    on every volume and discard ~90% of the work."""
    out = vol
    for i, (_, fn) in enumerate(_DEFAULT_CHAIN):
        key, k_gate, k_t = jax.random.split(key, 3)
        gate = jax.random.uniform(k_gate, ()) < prob
        out = jax.lax.cond(
            gate, lambda v, k=k_t, f=fn: f(k, v), lambda v: v, out
        )
    return out


def augment_subject(
    key: jax.Array,
    subject: Dict[str, jax.Array],
    prob: float = 0.1,
    keep: Optional[Dict[str, str]] = None,
) -> Dict[str, jax.Array]:
    """Subject-level augmentation: the *same* sampled transforms/parameters
    apply to every image of the subject (TorchIO subject semantics), and
    ``keep`` preserves pristine copies under new keys — the reference keeps
    the un-augmented DT target as ``dwi-tensor_orig``
    (``src/data_module.py:139``)."""
    keep = keep or {"dwi-tensor": "dwi-tensor_orig"}
    out = {}
    for src, dst in keep.items():
        if src in subject:
            out[dst] = subject[src]
    for name, vol in subject.items():
        out[name] = augment_volume(key, vol, prob)
    return out
