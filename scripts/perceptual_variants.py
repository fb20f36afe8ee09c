#!/usr/bin/env python3
"""Compare perceptual_distance formulations fwd+bwd on TPU.

v_old : single 2*C*N batched net call (round-2 committed form)
v_new : split pred/target calls, stop_gradient target, barrier on slabs
half  : standalone 48-slab net fwd+bwd(dx) — linear-scaling expectation

Usage: PYTHONPATH=$PYTHONPATH:/root/.axon_site python scripts/perceptual_variants.py
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


def main():
    from unet_bssfp_tpu.models.medicalnet import (
        MedicalNetResNet10, init_medicalnet, perceptual_distance,
    )
    from unet_bssfp_tpu.ops.metrics import znorm

    print(f"devices: {jax.devices()}", flush=True)
    B, C = 8, 6
    key = jax.random.PRNGKey(0)

    @jax.jit
    def data(k):
        a = jax.random.normal(k, (B, 64, 64, 64, C), jnp.float32)
        b = a + 0.1 * jax.random.normal(
            jax.random.fold_in(k, 1), a.shape, jnp.float32)
        return a, b

    a, b = data(key)
    sync((a, b))

    net = MedicalNetResNet10(dtype=jnp.bfloat16, phase_split=True)
    _, variables = init_medicalnet(seed=0)

    def unit(f):
        fu = f.astype(jnp.float32)
        return fu / (jnp.sqrt(jnp.sum(fu * fu, -1, keepdims=True)) + 1e-10)

    def v_old(v, pred, target):
        zp, zt = znorm(pred), znorm(target)
        slabs = [zp[..., i:i + 1] for i in range(C)]
        slabs += [zt[..., i:i + 1] for i in range(C)]
        stacked = jnp.concatenate(slabs, axis=0)
        feats = net.apply(v, stacked, train=False)
        fu = unit(feats)
        fp, ft = fu[: C * B], fu[C * B:]
        return jnp.mean(jnp.sum((fp - ft) ** 2, axis=-1))

    po = jax.jit(jax.grad(lambda x, v, y: v_old(v, x, y)))
    print(f"v_old  fwd+bwd : {two_point(po, (a, variables, b))*1e3:7.2f} ms",
          flush=True)

    pn = jax.jit(jax.grad(
        lambda x, v, y: perceptual_distance(net, v, x, y)))
    print(f"v_new  fwd+bwd : {two_point(pn, (a, variables, b))*1e3:7.2f} ms",
          flush=True)

    # standalone half-batch net fwd+bwd(dx)
    half = jnp.concatenate([znorm(a)[..., i:i + 1] for i in range(C)], axis=0)
    half = jax.jit(lambda x: jax.lax.optimization_barrier(x))(half)
    sync(half)
    hg = jax.jit(jax.grad(
        lambda x, v: jnp.sum(
            net.apply(v, x, train=False).astype(jnp.float32) ** 2)))
    print(f"half net f+b dx: {two_point(hg, (half, variables))*1e3:7.2f} ms",
          flush=True)
    hf = jax.jit(lambda v, x: jnp.sum(
        net.apply(v, x, train=False).astype(jnp.float32) ** 2))
    print(f"half net fwd   : {two_point(hf, (variables, half))*1e3:7.2f} ms",
          flush=True)

    # numerics: old vs new
    vo = jax.jit(lambda v, x, y: v_old(v, x, y))(variables, a, b)
    vn = jax.jit(lambda v, x, y: perceptual_distance(net, v, x, y))(
        variables, a, b)
    print(f"old={float(sync(vo)):.6f} new={float(sync(vn)):.6f}", flush=True)


if __name__ == "__main__":
    main()
