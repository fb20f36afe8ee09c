#!/usr/bin/env python3
"""MedicalNet stem conv (7³ s2 p3, Cin=1, Cout=64): two reformulations.

fwd:  space-to-depth — x (N,64³,1) → phases (N,32³,8), one dense 4³ conv
      8→64 (K=512 MXU-aligned vs the strided 7³ im2col).
dx:   w-packed phase conv — the existing dense 4³ 64→8 backward-data runs
      at 8/128 lanes; compute 16 adjacent w outputs per GEMM via a widened
      (4,4,19) stride-(1,1,16) kernel with Cout=128.  (P+3)/4 = 4.75× FLOPs
      for 16× lanes → ~3.4× net if MXU-bound.

Usage: PYTHONPATH=$PYTHONPATH:/root/.axon_site python scripts/stem_s2d_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import log, sync  # noqa: E402


def two_point(fn, *args, steps=10, warmup=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(warmup + steps):
        out = fn(*args)
    sync(out)
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / steps


N, S, CO = 48, 64, 64
SO = S // 2


def stem_plain(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), padding=[(3, 3)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def s2d_kernels(kernel):
    """(7,7,7,1,CO) → dense s2d kernel (4,4,4,8,CO), phase pd*4+ph*2+pw."""
    kp = jnp.pad(kernel[..., 0, :], ((1, 0), (1, 0), (1, 0), (0, 0)))
    idx = (jnp.array([0, 2, 4, 6]), jnp.array([1, 3, 5, 7]))
    phases = []
    for pd in range(2):
        gd = jnp.take(kp, idx[pd], axis=0)
        for ph in range(2):
            gh = jnp.take(gd, idx[ph], axis=1)
            for pw in range(2):
                phases.append(jnp.take(gh, idx[pw], axis=2))  # (4,4,4,CO)
    return jnp.stack(phases, axis=-2)  # (4,4,4,8,CO)


def to_s2d(x):
    n, d, h, w, _ = x.shape
    xs = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2)
    xs = jnp.transpose(xs, (0, 1, 3, 5, 2, 4, 6))
    return xs.reshape(n, d // 2, h // 2, w // 2, 8)


def stem_s2d(x, k):
    ks = s2d_kernels(k)
    return jax.lax.conv_general_dilated(
        to_s2d(x), ks, (1, 1, 1), padding=[(2, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def phase_kernels(kernel):
    # as medicalnet._stem_phase_kernels
    kp = jnp.pad(kernel[..., 0, :], ((1, 0), (1, 0), (1, 0), (0, 0)))
    idx = (jnp.array([6, 4, 2, 0]), jnp.array([7, 5, 3, 1]))
    phases = []
    for pd in range(2):
        gd = jnp.take(kp, idx[pd], axis=0)
        for ph in range(2):
            gh = jnp.take(gd, idx[ph], axis=1)
            for pw in range(2):
                phases.append(jnp.take(gh, idx[pw], axis=2))  # (4,4,4,CO)
    return jnp.stack(phases, axis=-1)  # (4,4,4,CO,8)


def dx_current(dy, k):
    pk = phase_kernels(k).astype(dy.dtype)
    ph = jax.lax.conv_general_dilated(
        dy, pk, (1, 1, 1), padding=[(1, 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    n, dd, hh, ww, _ = ph.shape
    ph = ph.reshape(n, dd, hh, ww, 2, 2, 2)
    ph = jnp.transpose(ph, (0, 1, 4, 2, 5, 3, 6))
    return ph.reshape(n, 2 * dd, 2 * hh, 2 * ww, 1)


def wpack_kernels(pk, P=16):
    """(4,4,4,CI,8) → (4,4,P+3,CI,8P): out w-group position j gets the taps
    of output w = P*g + j, i.e. K'[.., aw, ci, j*8+ph] = pk[.., aw-j, ci, ph]
    for 0 <= aw-j < 4."""
    a4, _, _, ci, co8 = pk.shape
    cols = []
    for j in range(P):
        cols.append(jnp.pad(pk, ((0, 0), (0, 0), (j, P - 1 - j),
                                 (0, 0), (0, 0))))
    kw = jnp.stack(cols, axis=-2)              # (4,4,P+3,CI,P,8)
    return kw.reshape(a4, a4, P + 3, ci, P * co8)


def dx_wpacked(dy, k, P=16):
    pk = phase_kernels(k).astype(dy.dtype)
    kw = wpack_kernels(pk, P)
    ph = jax.lax.conv_general_dilated(
        dy, kw, (1, 1, P), padding=[(1, 2), (1, 2), (1, 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # (N, 32, 32, 32/P, P*8)
    n, dd, hh, wg, _ = ph.shape
    ph = ph.reshape(n, dd, hh, wg, P, 2, 2, 2)     # (.., j, pd, ph, pw)
    ph = jnp.transpose(ph, (0, 1, 5, 2, 6, 3, 4, 7))
    return ph.reshape(n, 2 * dd, 2 * hh, 2 * wg * P, 1)


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (N, S, S, S, 1), jnp.float32))(key)
    kern = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (7, 7, 7, 1, CO), jnp.float32))(jax.random.PRNGKey(1))
    dy = jax.jit(lambda k: jax.random.normal(
        k, (N, SO, SO, SO, CO), jnp.float32))(jax.random.PRNGKey(2))

    # correctness in f32
    f_plain = jax.jit(stem_plain)
    f_s2d = jax.jit(stem_s2d)
    a = np.asarray(jax.device_get(f_plain(x, kern)[:1, :4, :4, :4]))
    b = np.asarray(jax.device_get(f_s2d(x, kern)[:1, :4, :4, :4]))
    log(f"s2d fwd max|err| (f32): {np.abs(a - b).max():.2e}")

    g_cur = jax.jit(dx_current)
    g_pack = jax.jit(dx_wpacked)
    a = np.asarray(jax.device_get(g_cur(dy, kern)[:1, :6, :6, :6]))
    b = np.asarray(jax.device_get(g_pack(dy, kern)[:1, :6, :6, :6]))
    log(f"wpacked dx max|err| (f32): {np.abs(a - b).max():.2e}")

    # timings in bf16 (the perceptual term's compute dtype)
    xb, kb, dyb = (v.astype(jnp.bfloat16) for v in (x, kern, dy))
    for name, fn, args in [
        ("stem fwd plain ", f_plain, (xb, kb)),
        ("stem fwd s2d   ", f_s2d, (xb, kb)),
        ("stem dx current", g_cur, (dyb, kb)),
        ("stem dx wpacked", g_pack, (dyb, kb)),
    ]:
        dt = two_point(fn, *args)
        log(f"{name}: {dt*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
