#!/usr/bin/env python3
"""Measure channel->batch slab-stack formulations for perceptual_distance.

(N, D, H, W, C) f32 -> (C*N, D, H, W, 1), order (c, n).

v_slices : concat of C minor-dim slices (round-3 committed form)
v_move   : single XLA transpose (moveaxis C to front)
v_pack   : pad C->8, pack_hw identity-GEMM (MXU transpose), slice+major
           transpose + reshape

Usage: PYTHONPATH=$PYTHONPATH:/root/.axon_site python scripts/stack_probe.py
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


N, S, C = 8, 64, 6


def v_slices(z):
    slabs = jnp.concatenate(
        [z[..., i:i + 1] for i in range(C)], axis=0)
    return jax.lax.optimization_barrier(slabs)


def v_move(z):
    n, d, h, w, c = z.shape
    out = jnp.moveaxis(z, -1, 0).reshape(c * n, d, h, w, 1)
    return jax.lax.optimization_barrier(out)


def v_pack(z):
    from unet_bssfp_tpu.ops.pallas.conv3d import pack_hw

    n, d, h, w, c = z.shape
    zp = jnp.pad(z, ((0, 0),) * 4 + ((0, 8 - c),))
    pk = pack_hw(zp)                       # (N, D, 8, HW)
    pk = pk[:, :, :c]                      # (N, D, C, HW)
    out = jnp.transpose(pk, (2, 0, 1, 3)).reshape(c * n, d, h, w, 1)
    return jax.lax.optimization_barrier(out)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    z = jax.jit(lambda k: jax.random.normal(
        k, (N, S, S, S, C), jnp.float32))(jax.random.PRNGKey(0))
    sync(z)

    ref = None
    for name, fn in (("slices", v_slices), ("move", v_move),
                     ("pack", v_pack)):
        f = jax.jit(fn)
        t = two_point(f, (z,))
        g = jax.jit(jax.grad(lambda x, fn=fn: jnp.sum(fn(x) ** 2)))
        tg = two_point(g, (z,))
        out = np.asarray(jax.device_get(f(z)[:2, :2, :2, :2]))
        if ref is None:
            ref = out
            ok = "ref"
        else:
            ok = "OK" if np.array_equal(ref, out) else "MISMATCH"
        print(f"{name:8s} fwd {t*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms  {ok}",
              flush=True)


if __name__ == "__main__":
    main()
