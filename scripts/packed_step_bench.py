"""End-to-end on-chip A/B of the conv backends: full GAN train step and
generator fwd/bwd with packed (Pallas) vs folded (XLA s2d) vs plain convs.

Also re-checks the tiny-channel compiled kernel (the historical worker-crash
case) before anything heavy touches the device. Two-point device_get sync.
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def two_point(fn, *args, n_short=2, n_long=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_short):
        out = fn(*args)
    _sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_long):
        out = fn(*args)
    _sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - n_short) * 1e3


def tiny_check():
    from unet_bssfp_tpu.ops.pallas.conv3d import (
        conv3x3_packed, conv3x3_reference_packed, pack_hw,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 64, 3),
                          jnp.float32) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 3, 4),
                          jnp.float32) * 0.3
    bias = jax.random.normal(jax.random.PRNGKey(2), (4,), jnp.float32)
    xk = pack_hw(x)
    got = np.asarray(jax.device_get(conv3x3_packed(xk, w, bias, 64)))
    ref = np.asarray(jax.device_get(
        conv3x3_reference_packed(xk, w, bias, 64)))
    print(f"tiny CIN=3 compiled max|err| = {np.abs(got - ref).max():.2e}",
          flush=True)


def main():
    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    tiny_check()

    B, P = 8, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, P, P, P, 24)).astype(np.float32))
    y = jnp.asarray(rng.random((B, P, P, P, 6)).astype(np.float32))
    tcfg = TrainConfig()

    variants = [
        ("plain ", ModelConfig(folded=False, packed=False)),
        ("folded", ModelConfig(folded=True, packed=False)),
        ("packed", ModelConfig(folded=False, packed=True)),
    ]
    outs = {}
    for tag, mcfg in variants:
        gen, disc = build_models("pc-bssfp", mcfg)
        state = create_gan_state(
            jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg, patch_size=P
        )

        @jax.jit
        def gen_fwd(params, bs, x):
            return gen.apply(
                {"params": params, "batch_stats": bs}, x, train=False)

        t_fwd = two_point(gen_fwd, state.gen_params, state.gen_batch_stats,
                          x.astype(jnp.bfloat16))
        outs[tag] = np.asarray(jax.device_get(
            gen_fwd(state.gen_params, state.gen_batch_stats,
                    x.astype(jnp.bfloat16))[0, :2, :2, :2, 0]
        )).astype(np.float32)

        step = make_train_step(gen, disc, tcfg, donate=False)
        s, m = step(state, x, y)
        _sync(m)
        t_step = two_point(lambda s_: step(s_, x, y)[0], s)
        print(f"{tag}: gen fwd {t_fwd:7.2f} ms | full GAN step "
              f"{t_step:7.2f} ms", flush=True)

    for tag in ("folded", "packed"):
        d = np.abs(outs[tag] - outs["plain "]).max()
        print(f"{tag} vs plain fwd sample diff: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
