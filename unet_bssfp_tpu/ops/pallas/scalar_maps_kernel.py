"""Pallas TPU kernel: fused DT eigendecomposition + scalar maps.

One pass over the volume computes everything ``ops.scalar_maps`` derives from
the 6-channel diffusion tensor — FA/MD/AD/RD/azimuth/inclination/RGB — with
the whole cyclic-Jacobi iteration kept in VMEM/registers. The XLA lowering of
the same math materialises rotation intermediates between fused loops; this
kernel reads the 6 input planes once and writes the 9 output planes once
(speed-of-light = HBM bandwidth on ~38MB in / ~57MB out per 96x128x128
volume).

Layout: component-planar. The caller reshapes the volume to ``(6, R, 128)``
(R = ceil(V/128) rows of 128 voxels); the grid tiles R. Outputs pack as
``(9, R, 128)``: [fa, md, ad, rd, azimuth, inclination, rgb_r, rgb_g, rgb_b].
Everything is lane-parallel elementwise VPU work — the kernel literally calls
the same ``eigh3x3_sym`` used by the XLA path on (rows, 128) blocks.

Status: parity-tested in interpret mode; NOT wired as the default. On this
environment's tunneled backend the remote AOT compile helper is SIGKILLed
(OOM) compiling the Jacobi kernel in both unrolled and fori_loop forms
(simpler kernels like fused_norm_act compile fine), and the XLA lowering of
``compute_scalar_maps`` already measures 1.3-1.4 ms per 96x128x128 volume —
small in absolute terms. Revisit on a directly-attached TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_bssfp_tpu.ops.eig3 import eigh3x3_sym

_LANES = 128
_ROWS = 256  # per-block sublane rows: 6*256*128*4B = 786KB in-VMEM input


def _atan2(y, x):
    """Branchless atan2 from a degree-11 minimax polynomial (Mosaic has no
    atan2 primitive). Max error ~1e-5 rad (~6e-4 deg) — inside the 1e-3
    parity budget."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    amax = jnp.maximum(ax, ay)
    amin = jnp.minimum(ax, ay)
    a = amin / jnp.where(amax == 0.0, 1.0, amax)
    s = a * a
    p = -0.0117212
    p = p * s + 0.05265332
    p = p * s + -0.11643287
    p = p * s + 0.19354346
    p = p * s + -0.33262347
    p = p * s + 0.99997726
    r = p * a
    half_pi = jnp.float32(jnp.pi / 2)
    r = jnp.where(ay > ax, half_pi - r, r)
    r = jnp.where(x < 0.0, jnp.float32(jnp.pi) - r, r)
    r = jnp.where(y < 0.0, -r, r)
    return jnp.where((ax == 0.0) & (ay == 0.0), 0.0, r)


def _acos(t):
    t = jnp.clip(t, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0)), t)


def _kernel(d_ref, out_ref):
    comps = tuple(d_ref[i] for i in range(6))  # each (ROWS, 128) f32
    # fori_loop form: the fully-unrolled Jacobi program gets the remote
    # Mosaic compile helper OOM-killed.
    w, v = eigh3x3_sym(*comps, unroll=False)
    lam0, lam1, lam2 = w[..., 0], w[..., 1], w[..., 2]

    ad = lam2
    rd = (lam0 + lam1) * 0.5
    md = (lam0 + lam1 + lam2) / 3.0
    var = jnp.sqrt(
        (lam0 - md) ** 2 + (lam1 - md) ** 2 + (lam2 - md) ** 2
    )
    norm = jnp.sqrt(lam0 * lam0 + lam1 * lam1 + lam2 * lam2)
    fa = jnp.sqrt(1.5) * var / jnp.where(norm == 0, 1.0, norm)

    v2x, v2y, v2z = v[..., 0, 2], v[..., 1, 2], v[..., 2, 2]
    rad2deg = 180.0 / jnp.pi
    azimuth = rad2deg * _atan2(v2y, v2x)
    r = jnp.sqrt(v2x * v2x + v2y * v2y + v2z * v2z)
    inclination = rad2deg * _acos(v2z / jnp.where(r == 0, 1.0, r))

    out_ref[0] = fa
    out_ref[1] = md
    out_ref[2] = ad
    out_ref[3] = rd
    out_ref[4] = azimuth
    out_ref[5] = inclination
    out_ref[6] = fa * jnp.abs(v2x)
    out_ref[7] = fa * jnp.abs(v2y)
    out_ref[8] = fa * jnp.abs(v2z)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scalar_maps_planar(d6_planar: jax.Array, interpret: bool = False
                       ) -> jax.Array:
    """``(6, R, 128)`` component planes → ``(9, R, 128)`` scalar planes."""
    _, rows, lanes = d6_planar.shape
    assert lanes == _LANES
    blk = min(_ROWS, rows)
    grid = (pl.cdiv(rows, blk),)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((9, rows, lanes), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, blk, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, blk, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d6_planar.astype(jnp.float32))


def compute_scalar_maps_fused(d6: jax.Array, interpret: bool = False):
    """Drop-in accelerated ``ops.scalar_maps.compute_scalar_maps`` for TPU:
    channels-last ``S + (6,)`` → ScalarMaps pytree (same field semantics).
    Falls back to the XLA implementation off-TPU."""
    from unet_bssfp_tpu.ops.scalar_maps import ScalarMaps, compute_scalar_maps

    if jax.default_backend() != "tpu" and not interpret:
        return compute_scalar_maps(d6)

    shape = d6.shape[:-1]
    v = 1
    for s in shape:
        v *= s
    rows = -(-v // _LANES)
    pad = rows * _LANES - v
    planar = jnp.moveaxis(d6, -1, 0).reshape(6, v)
    if pad:
        planar = jnp.pad(planar, ((0, 0), (0, pad)))
    planar = planar.reshape(6, rows, _LANES)

    out = scalar_maps_planar(planar, interpret=interpret)
    flat = out.reshape(9, rows * _LANES)[:, :v]

    def unflat(i):
        return flat[i].reshape(shape)

    rgb = jnp.stack([unflat(6), unflat(7), unflat(8)], axis=-1)
    return ScalarMaps(
        fa=unflat(0),
        md=unflat(1),
        ad=unflat(2),
        rd=unflat(3),
        azimuth=unflat(4),
        inclination=unflat(5),
        rgb=rgb,
    )
