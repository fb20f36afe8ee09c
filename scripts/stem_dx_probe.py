#!/usr/bin/env python3
"""Attribute + fix the MedicalNet stem conv's dx (backward-data) cost.

Forward: x (48, 64³, 1) --k7 s2 p3--> y (48, 32³, 64).
XLA's backward-data is a transposed conv: input-dilate dy by 2, flipped k7,
Cout=1 — MXU-hostile.  Candidate: phase-split dx — one dense conv
dy (48,32³,64) --k4 s1--> (48,32³,8) (one channel per output phase, taps
zero-padded into a 4³ kernel), then depth-to-space to (48,64³,1).

Usage: PYTHONPATH=$PYTHONPATH:/root/.axon_site python scripts/stem_dx_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[-1]
    scalar = leaf.ravel()[0] if leaf.ndim else leaf
    return np.asarray(jax.device_get(scalar))


def two_point(fn, args, steps=10, warmup=2):
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


N, S, K, CO = 48, 64, 7, 64
SO = S // 2  # 32


def stem(x, k):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2, 2),
        padding=[(3, 3)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def dx_xla(dy, k):
    g = jax.grad(lambda x: jnp.sum(stem(x, k).astype(jnp.float32) * dy))
    return g(jnp.zeros((N, S, S, S, 1), jnp.float32))


def phase_kernels(k):
    """Build the (4,4,4,CO,8) dense phase kernel from the (7,7,7,1,CO) stem kernel.

    dx[i] = sum_j dy[j] * W[i + 3 - 2j] (per axis).  For output phase
    p = i mod 2, valid taps t = i + 3 - 2j have t ≡ p+3 ≡ p+1 (mod 2).
    With u = j - (i - p)//2 ∈ [p-1 .. p+1] shifted to a 4-window index
    a = u - (p - 1) ∈ [0..3] (wait — derive directly below).

    Per axis: i = 2q + p, dx[2q+p] = Σ_j dy[j] W[2q + p + 3 - 2j].
    Let u = q - j + offset.  Taps: t = p + 3 - 2(j - q) must be in [0,6] →
    (j - q) ∈ ceil((p-3)/2) .. floor((p+3)/2) = [-1..1] for p=0 ([-1,0,1]:
    t=5,3,1) and [-1..2] for p=1 (t=6,4,2,0).  So dy window is j ∈ q-1..q+2
    (4 wide, left pad 1, right pad 2) for both phases; tap at window pos
    a = j - q + 1 ∈ [0..3] uses W[t] with t = p + 3 - 2(a - 1) = p + 5 - 2a,
    valid when 0 ≤ t ≤ 6.
    """
    k = k[..., 0, :]  # (7,7,7,CO)
    out = np.zeros((4, 4, 4, CO, 8), np.float32)
    kn = np.asarray(k, np.float32)
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                phase = pd * 4 + ph * 2 + pw
                for ad in range(4):
                    td = pd + 5 - 2 * ad
                    if not (0 <= td <= 6):
                        continue
                    for ah in range(4):
                        th = ph + 5 - 2 * ah
                        if not (0 <= th <= 6):
                            continue
                        for aw in range(4):
                            tw = pw + 5 - 2 * aw
                            if not (0 <= tw <= 6):
                                continue
                            out[ad, ah, aw, :, phase] = kn[td, th, tw, :]
    return jnp.asarray(out)


def dx_phase(dy, pk):
    ph = jax.lax.conv_general_dilated(
        dy.astype(jnp.bfloat16), pk.astype(jnp.bfloat16), (1, 1, 1),
        padding=[(1, 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))  # (N, 32³, 8)
    # depth-to-space: channel p = pd*4+ph*2+pw → spatial offsets
    n, d, h, w, _ = ph.shape
    ph = ph.reshape(n, d, h, w, 2, 2, 2)
    ph = jnp.transpose(ph, (0, 1, 4, 2, 5, 3, 6))
    return ph.reshape(n, 2 * d, 2 * h, 2 * w, 1).astype(jnp.float32)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (K, K, K, 1, CO), jnp.float32) * 0.05
    dy = jax.jit(lambda s: jax.random.normal(s, (N, SO, SO, SO, CO),
                                             jnp.float32))(
        jax.random.PRNGKey(1))
    sync((k, dy))

    f_xla = jax.jit(dx_xla)
    t = two_point(f_xla, (dy, k))
    print(f"dx XLA transposed-conv : {t*1e3:7.2f} ms", flush=True)

    pk = phase_kernels(k)
    f_ph = jax.jit(dx_phase)
    t2 = two_point(f_ph, (dy, pk))
    print(f"dx phase-split dense   : {t2*1e3:7.2f} ms", flush=True)

    ref = np.asarray(jax.device_get(f_xla(dy, k)), np.float32)
    got = np.asarray(jax.device_get(f_ph(dy, pk)), np.float32)
    scale = np.abs(ref).max() + 1e-12
    err = np.abs(ref - got).max() / scale
    print(f"rel max err            : {err:.3e}", flush=True)

    # also time the stem fwd for context
    x = jnp.zeros((N, S, S, S, 1), jnp.float32)
    f_f = jax.jit(stem)
    print(f"stem fwd               : {two_point(f_f, (x, k))*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
