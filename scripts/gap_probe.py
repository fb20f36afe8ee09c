"""Locate the ~27 ms gap between the packed generator's stage-sum fwd+bwd
(57 ms, scripts/stage_attrib.py) and the whole-gen fwd+bwd (84 ms): dropout,
train-mode InstanceNorm, relayout VJPs (pack_hw / packed_max_pool2), head
conv.

Run on the attached TPU: python scripts/gap_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


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


def main():
    import dataclasses

    from unet_bssfp_tpu.config import ModelConfig
    from unet_bssfp_tpu.train.state import build_models
    from unet_bssfp_tpu.ops.pallas.conv3d import pack_hw_auto
    from unet_bssfp_tpu.models.packed_layers import packed_max_pool2

    log(f"devices: {jax.devices()}")
    B = 8
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (B, 64, 64, 64, 24), jnp.float32))(key)

    for tag, mkw, train in [
        ("train=True  dropout=.05", {}, True),
        ("train=True  dropout=0  ", {"dropout": 0.0}, True),
        ("train=False            ", {}, False),
    ]:
        mcfg = ModelConfig(**mkw)
        gen, _ = build_models("pc-bssfp", mcfg)
        variables = gen.init(
            {"params": jax.random.PRNGKey(0), "dropout": key}, x, train=True)
        params = variables["params"]
        bs = variables.get("batch_stats", {})

        @jax.jit
        def fwd_bwd(p, x, train=train, gen=gen, bs=bs):
            def loss(p):
                out = gen.apply(
                    {"params": p, "batch_stats": bs}, x, train=train,
                    rngs={"dropout": jax.random.PRNGKey(1)} if train else None,
                    mutable=["batch_stats"] if train else False,
                )
                y = (out[0] if train else out).astype(jnp.float32)
                return jnp.sum(y * y)
            return jax.grad(loss)(p)

        dt = two_point(fwd_bwd, params, x)
        log(f"gen fwd+bwd {tag}: {dt*1e3:6.1f} ms")

    # relayout pieces
    @jax.jit
    def pack_fb(x):
        def loss(x):
            return jnp.sum(pack_hw_auto(x).astype(jnp.float32) ** 2)
        return jax.grad(loss)(x)

    dt = two_point(pack_fb, x.astype(jnp.bfloat16))
    log(f"pack_hw 64^3x24 fwd+bwd: {dt*1e3:6.2f} ms")

    xk = jax.jit(pack_hw_auto)(
        jax.jit(lambda k: jax.random.normal(
            k, (B, 64, 64, 64, 32), jnp.bfloat16))(key))

    @jax.jit
    def pool_fb(xk):
        def loss(xk):
            return jnp.sum(packed_max_pool2(xk, 64).astype(jnp.float32) ** 2)
        return jax.grad(loss)(xk)

    dt = two_point(pool_fb, xk)
    log(f"packed_max_pool2 64^3x32 fwd+bwd: {dt*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
