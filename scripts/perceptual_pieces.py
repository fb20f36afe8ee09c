#!/usr/bin/env python3
"""Attribute the MedicalNet perceptual term's cost piece by piece on TPU.

The per-stage probe (scripts/perceptual_probe.py) showed the ResNet conv
stages cost ~17 ms fwd at the parity shape (96 slabs of 64³) while the whole
``perceptual_distance`` costs ~50 ms fwd / ~120 ms fwd+bwd.  This script
measures each piece standalone (fwd and VJP where relevant):

  1. znorm of the (8, 64³, 6) pred/target pair
  2. channel→batch slab stacking (the minor-dim gather) and its VJP scatter
  3. ``net.apply`` on pre-stacked slabs (the real module, not a re-impl)
  4. unit-normalise + squared-distance reduction on the (96, 8³, 512) feats
  5. the full ``perceptual_distance`` for cross-checking the sum
  6. a grouped-stem candidate: run the stem conv + BN/relu/maxpool on the
     native (N, D, H, W, C) layout with ``feature_group_count=C`` and defer
     the channel→batch split to 16³ resolution (numerics-checked vs 1-3).

Usage: PYTHONPATH=$PYTHONPATH:/root/.axon_site python scripts/perceptual_pieces.py
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

    # 1. znorm ------------------------------------------------------------
    zn = jax.jit(lambda x: znorm(x))
    print(f"znorm fwd            : {two_point(zn, (a,))*1e3:7.2f} ms", flush=True)
    zn_g = jax.jit(jax.grad(lambda x: jnp.sum(znorm(x) ** 2)))
    print(f"znorm fwd+bwd        : {two_point(zn_g, (a,))*1e3:7.2f} ms", flush=True)

    # 2. slab stacking ----------------------------------------------------
    def stack(x, y):
        slabs = [x[..., i:i + 1] for i in range(C)]
        slabs += [y[..., i:i + 1] for i in range(C)]
        return jnp.concatenate(slabs, axis=0)

    st = jax.jit(stack)
    print(f"stack fwd            : {two_point(st, (a, b))*1e3:7.2f} ms", flush=True)
    st_g = jax.jit(jax.grad(lambda x, y: jnp.sum(stack(x, y) ** 2)))
    print(f"stack fwd+bwd        : {two_point(st_g, (a, b))*1e3:7.2f} ms", flush=True)

    stacked = st(a, b)
    sync(stacked)

    # 3. net.apply on pre-stacked slabs ----------------------------------
    ap = jax.jit(lambda v, x: jnp.sum(
        net.apply(v, x, train=False).astype(jnp.float32) ** 2))
    print(f"net.apply fwd        : {two_point(ap, (variables, stacked))*1e3:7.2f} ms",
          flush=True)
    ap_g = jax.jit(jax.grad(
        lambda x, v: jnp.sum(
            net.apply(v, x, train=False).astype(jnp.float32) ** 2)))
    print(f"net.apply fwd+bwd(dx): {two_point(ap_g, (stacked, variables))*1e3:7.2f} ms",
          flush=True)

    feats = jax.jit(lambda v, x: net.apply(v, x, train=False))(
        variables, stacked)
    sync(feats)
    print(f"feats shape {feats.shape} dtype {feats.dtype}", flush=True)

    # 4. unit + distance --------------------------------------------------
    def dist(f):
        fu = f.astype(jnp.float32)
        fu = fu / (jnp.sqrt(jnp.sum(fu * fu, -1, keepdims=True)) + 1e-10)
        fp, ft = fu[: C * B], fu[C * B:]
        return jnp.mean(jnp.sum((fp - ft) ** 2, axis=-1))

    di = jax.jit(dist)
    print(f"unit+dist fwd        : {two_point(di, (feats,))*1e3:7.2f} ms", flush=True)
    di_g = jax.jit(jax.grad(dist))
    print(f"unit+dist fwd+bwd    : {two_point(di_g, (feats,))*1e3:7.2f} ms", flush=True)

    # 5. full perceptual_distance ----------------------------------------
    pd = jax.jit(lambda v, x, y: perceptual_distance(net, v, x, y))
    print(f"perceptual fwd       : {two_point(pd, (variables, a, b))*1e3:7.2f} ms",
          flush=True)
    pd_g = jax.jit(jax.grad(
        lambda x, v, y: perceptual_distance(net, v, x, y)))
    print(f"perceptual fwd+bwd   : {two_point(pd_g, (a, variables, b))*1e3:7.2f} ms",
          flush=True)

    # 6. grouped-stem candidate ------------------------------------------
    p = variables["params"]
    bs = variables["batch_stats"]
    k1 = p["conv1"]["kernel"].astype(jnp.bfloat16)       # (7,7,7,1,64)
    scale = p["bn1"]["scale"].astype(jnp.float32)
    bias = p["bn1"]["bias"].astype(jnp.float32)
    mean = bs["bn1"]["mean"].astype(jnp.float32)
    var = bs["bn1"]["var"].astype(jnp.float32)

    def grouped_stem(x, y):
        xy = jnp.concatenate([x, y], axis=0)             # (2N, 64³, C)
        kg = jnp.tile(k1, (1, 1, 1, 1, C))               # (7,7,7,1,C*64)
        out = jax.lax.conv_general_dilated(
            xy.astype(jnp.bfloat16), kg, (2, 2, 2), padding=[(3, 3)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=C,
        )                                                # (2N, 32³, C*64)
        sc = jnp.tile(scale / jnp.sqrt(var + 1e-5), (C,))
        bi = jnp.tile(bias - mean * scale / jnp.sqrt(var + 1e-5), (C,))
        out = jnp.maximum(
            out.astype(jnp.float32) * sc + bi, 0.0).astype(jnp.bfloat16)
        from flax import linen as nn
        out = nn.max_pool(out, window_shape=(3, 3, 3), strides=(2, 2, 2),
                          padding=((1, 1),) * 3)          # (2N, 16³, C*64)
        n2, d2, h2, w2, _ = out.shape
        out = out.reshape(n2, d2, h2, w2, C, 64)
        out = jnp.transpose(out, (4, 0, 1, 2, 3, 5))
        # order: (c, [x-batch, y-batch]) → want ([x c0..c5, y c0..c5], n)
        out = out.reshape(C, 2, B, d2, h2, w2, 64)
        out = jnp.transpose(out, (1, 0, 2, 3, 4, 5, 6))
        return out.reshape(2 * C * B, d2, h2, w2, 64)

    gs = jax.jit(grouped_stem)
    print(f"grouped stem fwd     : {two_point(gs, (a, b))*1e3:7.2f} ms", flush=True)
    gs_g = jax.jit(jax.grad(
        lambda x, y: jnp.sum(grouped_stem(x, y).astype(jnp.float32) ** 2)))
    print(f"grouped stem fwd+bwd : {two_point(gs_g, (a, b))*1e3:7.2f} ms", flush=True)

    # reference stem on stacked slabs, for numerics + time
    from flax import linen as nn

    def ref_stem(x, y):
        s = stack(x, y)
        o = jax.lax.conv_general_dilated(
            s.astype(jnp.bfloat16), k1, (2, 2, 2), padding=[(3, 3)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        sc = scale / jnp.sqrt(var + 1e-5)
        bi = bias - mean * sc
        o = jnp.maximum(o.astype(jnp.float32) * sc + bi, 0.0).astype(jnp.bfloat16)
        return nn.max_pool(o, window_shape=(3, 3, 3), strides=(2, 2, 2),
                           padding=((1, 1),) * 3)

    rs = jax.jit(ref_stem)
    print(f"stack+stem fwd       : {two_point(rs, (a, b))*1e3:7.2f} ms", flush=True)
    ref = np.asarray(jax.device_get(rs(a, b)), np.float32)
    got = np.asarray(jax.device_get(gs(a, b)), np.float32)
    err = np.max(np.abs(ref - got))
    print(f"grouped-stem max |err| vs stack+stem: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
