"""Staged timing experiment on the attached chip: where does the GAN step's
time go, and what do the candidate optimisations buy?

Run:  python scripts/perf_experiment.py
All timings use two-point readback-cancelling measurement (see bench.py).
NB: params must be *arguments* of the jitted fns — closed-over arrays are
baked into the HLO as constants and blow the tunnel's remote-compile request
limit (HTTP 413).
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import log, sync  # noqa: E402


def two_point(fn, init, n_short=3, n_long=23):
    out = init
    t0 = time.perf_counter()
    for _ in range(n_short):
        out = fn(out)
    sync(out)
    t1 = time.perf_counter() - t0
    out = init
    t0 = time.perf_counter()
    for _ in range(n_long):
        out = fn(out)
    sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - n_short)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--patch", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.ops.losses import l1_loss
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    B, P = args.batch, args.patch
    mcfg = ModelConfig()
    tcfg = TrainConfig()
    gen, disc = build_models("pc-bssfp", mcfg)
    import dataclasses
    gen_nofuse, _ = build_models(
        "pc-bssfp", dataclasses.replace(mcfg, use_pallas=False)
    )
    state = create_gan_state(
        jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg, patch_size=P
    )
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.random((B, P, P, P, 24)).astype(np.float32))
    y32 = jnp.asarray(rng.random((B, P, P, P, 6)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    y16 = y32.astype(jnp.bfloat16)

    log(f"devices: {jax.devices()}  batch={B} patch={P}")

    # 1. generator forward (eval mode)
    @jax.jit
    def gen_fwd(params, bs, x):
        return gen.apply({"params": params, "batch_stats": bs}, x,
                         train=False)

    sync(gen_fwd(state.gen_params, state.gen_batch_stats, x32))
    dt = two_point(
        lambda _: gen_fwd(state.gen_params, state.gen_batch_stats, x32), None
    )
    log(f"gen fwd (eval, fused IN): {dt*1e3:.1f} ms")

    @jax.jit
    def gen_fwd_nofuse(params, bs, x):
        return gen_nofuse.apply({"params": params, "batch_stats": bs}, x,
                                train=False)

    sync(gen_fwd_nofuse(state.gen_params, state.gen_batch_stats, x32))
    dt = two_point(
        lambda _: gen_fwd_nofuse(
            state.gen_params, state.gen_batch_stats, x32
        ),
        None,
    )
    log(f"gen fwd (eval, XLA IN): {dt*1e3:.1f} ms")

    # 2. generator fwd+bwd (L1 only)
    @jax.jit
    def gen_fwd_bwd(params, bs, x, y):
        def loss(p):
            y_hat = gen.apply({"params": p, "batch_stats": bs}, x,
                              train=False)
            return l1_loss(y_hat.astype(jnp.float32), y)

        return jax.grad(loss)(params)

    sync(gen_fwd_bwd(state.gen_params, state.gen_batch_stats, x32, y32))
    dt = two_point(
        lambda _: gen_fwd_bwd(
            state.gen_params, state.gen_batch_stats, x32, y32
        ),
        None,
    )
    log(f"gen fwd+bwd: {dt*1e3:.1f} ms")

    # 3. discriminator fwd+bwd
    @jax.jit
    def disc_fwd_bwd(params, bs, x, y):
        def loss(p):
            logits = disc.apply({"params": p, "batch_stats": bs}, x, y,
                                train=False)
            return jnp.mean(logits)

        return jax.grad(loss)(params)

    sync(disc_fwd_bwd(state.disc_params, state.disc_batch_stats, x32, y32))
    dt = two_point(
        lambda _: disc_fwd_bwd(
            state.disc_params, state.disc_batch_stats, x32, y32
        ),
        None,
    )
    log(f"disc fwd+bwd: {dt*1e3:.1f} ms")

    # 4. full step variants
    for name, kwargs, (xx, yy) in [
        ("full step (parity, fp32 in)", {}, (x32, y32)),
        ("full step (parity, bf16 in)", {}, (x16, y16)),
        ("full step (reuse_fake)", {"reuse_fake": True}, (x32, y32)),
        ("full step (reuse_fake, bf16 in)", {"reuse_fake": True}, (x16, y16)),
    ]:
        step = make_train_step(gen, disc, tcfg, donate=False, **kwargs)

        def run(carry, step=step, xx=xx, yy=yy):
            s = carry[0] if carry else state
            return step(s, xx, yy)

        out = run(None)
        sync(out[1])
        dt = two_point(run, None)
        log(f"{name}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
