"""Dropout/epilogue cost in PackedConvNormAct at the hot stage shape
(8, 64, 32, 64·64): the reference objective applies InstanceNorm → Dropout
→ LeakyReLU after every stage conv (/root/reference/src/model.py:50-65 via
MONAI TwoConv); this measures where those ~14 ms/step go and what an
epilogue dtype change or a fused Pallas kernel could recover.

Variants (fwd and fwd+bwd, rbg RNG like the shipped default):
  cur   f32 IN → f32 dropout → f32 leaky → cast bf16   (shipped epilogue)
  bf16d f32 IN → cast bf16 → bf16 dropout → bf16 leaky
  nodrop f32 IN → leaky → cast               (lower bound)
  maskonly just the bernoulli mask draw                (RNG cost floor)

Run on the attached TPU: python scripts/epilogue_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_prng_impl", "rbg")

P = 0.05
SLOPE = 0.1


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


def _in_f32(yk, scale, bias):
    yf = yk.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 3), keepdims=True)
    var = jnp.var(yf, axis=(1, 3), keepdims=True)
    y = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * scale.reshape(1, 1, -1, 1) + bias.reshape(1, 1, -1, 1)


def _drop(y, key):
    keep = jax.random.bernoulli(key, 1.0 - P, y.shape)
    return jnp.where(keep, y / (1.0 - P), jnp.zeros((), y.dtype))


def e_cur(yk, scale, bias, key):
    y = _in_f32(yk, scale, bias)
    y = _drop(y, key)
    return jax.nn.leaky_relu(y, SLOPE).astype(jnp.bfloat16)


def e_bf16d(yk, scale, bias, key):
    y = _in_f32(yk, scale, bias).astype(jnp.bfloat16)
    y = _drop(y, key)
    return jax.nn.leaky_relu(y, SLOPE)


def e_nodrop(yk, scale, bias, key):
    y = _in_f32(yk, scale, bias)
    return jax.nn.leaky_relu(y, SLOPE).astype(jnp.bfloat16)


def e_maskonly(yk, scale, bias, key):
    return jax.random.bernoulli(key, 1.0 - P, yk.shape)


def main():
    log(f"devices: {jax.devices()}")
    B, D, C, HW = 8, 64, 32, 4096
    k0 = jax.random.PRNGKey(0)
    yk = jax.jit(lambda k: jax.random.normal(
        k, (B, D, C, HW), jnp.float32).astype(jnp.bfloat16))(k0)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    key = jax.random.PRNGKey(1)

    for name, fn in (("cur", e_cur), ("bf16d", e_bf16d),
                     ("nodrop", e_nodrop), ("maskonly", e_maskonly)):
        jf = jax.jit(fn)
        tf = two_point(jf, yk, scale, bias, key) * 1e3

        if name == "maskonly":
            log(f"{name:9s} fwd {tf:6.2f} ms")
            continue

        @jax.jit
        def fb(yk_, s_, b_, k_, fn=fn):
            def loss(a, s, bb):
                return jnp.sum(fn(a, s, bb, k_).astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(yk_, s_, b_)

        tb = two_point(fb, yk, scale, bias, key) * 1e3
        log(f"{name:9s} fwd {tf:6.2f} ms   fwd+bwd {tb:6.2f} ms")


if __name__ == "__main__":
    main()
