#!/usr/bin/env python3
"""Probe the MedicalNet perceptual term on the attached TPU.

Measures, with the two-point device_get sync (bench.py::sync — block_until_
ready does not block over the axon tunnel):
  1. perceptual fwd and fwd+bwd at the parity shape (batch 8×64³, 6-channel
     DT → 96 single-channel slabs) for {f32, bf16} × {phase_split on, off};
  2. per-stage forward cost (stem / layer1 / layer2 / layer3 / layer4) to
     locate the next kernel target.

Usage: python scripts/perceptual_probe.py [--steps 10]
"""

from __future__ import annotations

import argparse
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


def two_point(fn, args, steps, warmup=2):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from unet_bssfp_tpu.models.medicalnet import (
        MedicalNetResNet10,
        init_medicalnet,
        perceptual_distance,
    )

    print(f"devices: {jax.devices()}", flush=True)
    B, C = args.batch, 6

    key = jax.random.PRNGKey(0)

    for dtype_name in ("float32", "bfloat16"):
        for ps in (True, False):
            net = MedicalNetResNet10(
                dtype=jnp.dtype(dtype_name), phase_split=ps
            )
            _, variables = init_medicalnet(seed=0)

            @jax.jit
            def fwd(v, a, b):
                return perceptual_distance(net, v, a, b)

            @jax.jit
            def fwdbwd(v, a, b):
                # grad w.r.t. the prediction — what the GAN step pays
                return jax.grad(
                    lambda a_: perceptual_distance(net, v, a_, b)
                )(a)

            @jax.jit
            def data(k):
                a = jax.random.normal(k, (B, 64, 64, 64, C), jnp.float32)
                b = a + 0.1 * jax.random.normal(
                    jax.random.fold_in(k, 1), (B, 64, 64, 64, C),
                    jnp.float32,
                )
                return a, b

            a, b = data(key)
            sync((a, b))
            t_f = two_point(fwd, (variables, a, b), args.steps)
            t_fb = two_point(fwdbwd, (variables, a, b), args.steps)
            print(
                f"perceptual {dtype_name:8s} phase_split={ps}: "
                f"fwd {t_f*1e3:7.1f} ms   fwd+bwd {t_fb*1e3:7.1f} ms",
                flush=True,
            )

    # ---- per-stage forward (bf16, phase_split on) ------------------------
    print("\nper-stage forward, 96 slabs of 64³ (bf16):", flush=True)
    net = MedicalNetResNet10(dtype=jnp.bfloat16, phase_split=True)
    _, variables = init_medicalnet(seed=0)
    from flax import linen as nn

    slabs = jax.jit(
        lambda k: jax.random.normal(k, (B * 2 * C, 64, 64, 64, 1),
                                    jnp.float32)
    )(key)
    sync(slabs)

    # stage boundaries via increasing prefixes (difference = stage cost)
    prefixes = ("stem", "layer1", "layer2", "layer3", "layer4")
    from unet_bssfp_tpu.models.medicalnet import BasicBlock3D

    class Prefix(nn.Module):
        n: int

        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, kernel_size=(7, 7, 7), strides=(2, 2, 2),
                        padding=3, use_bias=False, dtype=jnp.bfloat16,
                        name="conv1")(x)
            y = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.bfloat16,
                             name="bn1")(y)
            y = nn.relu(y)
            y = nn.max_pool(y, window_shape=(3, 3, 3), strides=(2, 2, 2),
                            padding=((1, 1),) * 3)
            stages = [
                dict(features=64, name="layer1_0"),
                dict(features=128, stride=2, name="layer2_0"),
                dict(features=256, dilation=2, name="layer3_0"),
                dict(features=512, dilation=4, name="layer4_0"),
            ]
            for s in stages[: self.n]:
                y = BasicBlock3D(dtype=jnp.bfloat16, phase_split=True,
                                 **s)(y, False)
            return y

    prev = 0.0
    for n in range(5):
        mod = Prefix(n)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), slabs[:1])

        @jax.jit
        def run(v_, x):
            return jnp.sum(mod.apply(v_, x).astype(jnp.float32) ** 2)

        t = two_point(run, (v, slabs), args.steps)
        print(f"  prefix {prefixes[n]:8s}: {t*1e3:7.1f} ms "
              f"(stage +{(t-prev)*1e3:6.1f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
