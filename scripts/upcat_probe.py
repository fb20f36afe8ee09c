"""Attribute upcat_1's 31.9 ms fwd+bwd (the parity step's hottest stage):
deconv, pack relayout, and the two packed convs, timed separately.

Run on the attached TPU: python scripts/upcat_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402


def two_point(fn, *args, n_short=3, n_long=13):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n_short):
        out = fn(*args)
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_long):
        out = fn(*args)
    sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - n_short)


def bench_mod(name, mod, *xs):
    params = mod.init(jax.random.PRNGKey(0), *xs)

    @jax.jit
    def fwd(p, *xs):
        return mod.apply(p, *xs)

    @jax.jit
    def fwd_bwd(p, *xs):
        def loss(p):
            y = mod.apply(p, *xs).astype(jnp.float32)
            return jnp.sum(y * y)
        return jax.grad(loss)(p)

    f = two_point(fwd, params, *xs)
    b = two_point(fwd_bwd, params, *xs)
    log(f"{name}: fwd {f*1e3:6.2f} ms | fwd+bwd {b*1e3:6.2f} ms")


def main():
    from unet_bssfp_tpu.models.packed_layers import (
        PackedConvNormAct, _PackedPair,
    )
    from unet_bssfp_tpu.ops.pallas.conv3d import pack_hw_auto

    log(f"devices: {jax.devices()}")
    B = 8
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def rnd(shape):
        return jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.float32).astype(dt)
        )(key)

    # 1. deconv 64->64, 32^3 -> 64^3
    x = rnd((B, 32, 32, 32, 64))
    bench_mod(
        "deconv 32^3->64^3 64->64",
        nn.ConvTranspose(64, (2, 2, 2), strides=(2, 2, 2), dtype=dt), x)

    # 2. pack of the deconv output
    up = rnd((B, 64, 64, 64, 64))

    @jax.jit
    def pack_fb(up):
        def loss(u):
            return jnp.sum(pack_hw_auto(u).astype(jnp.float32) ** 2)
        return jax.grad(loss)(up)

    @jax.jit
    def pack_f(up):
        return pack_hw_auto(up)

    f = two_point(pack_f, up)
    b = two_point(pack_fb, up)
    log(f"pack_hw 64^3x64: fwd {f*1e3:6.2f} ms | fwd+bwd {b*1e3:6.2f} ms")

    # 3. the two packed convs (96 -> 32 -> 32)
    xk = rnd((B, 64, 96, 4096))
    bench_mod("packed pair 96->32->32", _PackedPair(32, 64, dtype=dt), xk)

    # 4. single packed conv pieces
    bench_mod("packed conv 96->32", PackedConvNormAct(32, 64, dtype=dt),
              rnd((B, 64, 96, 4096)))
    bench_mod("packed conv 32->32", PackedConvNormAct(32, 64, dtype=dt),
              rnd((B, 64, 32, 4096)))
    # conv_0's pieces for comparison
    bench_mod("packed conv 24->32", PackedConvNormAct(32, 64, dtype=dt),
              rnd((B, 64, 24, 4096)))


if __name__ == "__main__":
    main()
